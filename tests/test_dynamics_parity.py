"""Engine-vs-MuJoCo trajectory parity (SURVEY.md §7 M2 acceptance)."""
import pytest

pytest.importorskip("mujoco")

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.dynamics_parity import run_parity


@pytest.fixture(scope="module")
def scene_available():
    from go2_rl_gym_tpu.deploy import mujoco_eval
    try:
        mujoco_eval.find_scene("flat")
    except FileNotFoundError:
        pytest.skip("go2 MJCF scenes not available")


def test_standing_parity(scene_available):
    r = run_parity(steps=100, scenario="stand")
    # after 0.5 s of PD standing, the two engines agree closely
    assert r["err_at_0.5s"]["pos"] < 0.03, r
    assert r["err_at_0.5s"]["ang"] < 0.1, r
    assert r["err_at_0.5s"]["joint"] < 0.15, r
    assert abs(r["final_z_mujoco"] - r["final_z_ours"]) < 0.03, r


def test_walking_excitation_parity(scene_available):
    r = run_parity(steps=100, scenario="walk")
    assert r["err_at_0.5s"]["pos"] < 0.05, r
    assert r["err_at_0.5s"]["joint"] < 0.25, r
