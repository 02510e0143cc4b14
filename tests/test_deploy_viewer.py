"""Velocity-arrow overlay + interactive tooling (deploy/viewer.py; reference
deploy/deploy_mujoco/utils.py:6-112 semantics: green command arrow, blue
measured-velocity arrow, hidden below 0.1 display length)."""
import numpy as np
import pytest
from go2_rl_gym_tpu.deploy import viewer as vw

def test_arrow_pose_math():
    # +x velocity of 1 m/s -> arrow length 0.7, z-axis rotated onto +x
    size, pos, mat = vw.arrow_pose(np.zeros(3), np.array([1.0, 0, 0]))
    np.testing.assert_allclose(size, [0.02, 0.02, 0.7], atol=1e-6)
    np.testing.assert_allclose(mat[:, 2], [0.7, 0, 0], atol=1e-6)
    # below the display threshold -> hidden
    assert vw.arrow_pose(np.zeros(3), np.array([0.05, 0, 0])) is None
    # straight down (antiparallel) doesn't blow up
    size, _, mat = vw.arrow_pose(np.zeros(3), np.array([0, 0, -1.0]))
    np.testing.assert_allclose(mat[:, 2], [0, 0, -0.7], atol=1e-6)

def test_velocity_arrows_frames():
    qpos = np.zeros(19); qpos[3] = 1.0; qpos[2] = 0.3    # identity quat
    qvel = np.zeros(18); qvel[0] = 0.5                   # world +x 0.5 m/s
    arrows = vw.velocity_arrows(qpos, qvel, cmd_xy=(1.0, 0.0))
    assert len(arrows) == 2
    (s1, p1, m1, c1), (s2, p2, m2, c2) = arrows
    np.testing.assert_allclose(p1, [0, 0, 0.5], atol=1e-6)   # 0.2 above base
    assert tuple(c1[:3]) == (0, 1, 0) and tuple(c2[:3]) == (0, 0, 1)
    np.testing.assert_allclose(m1[:, 2], [0.7, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m2[:, 2], [0.35, 0, 0], atol=1e-6)

def test_draw_into_mjv_scene():
    import mujoco
    from go2_rl_gym_tpu.deploy.mujoco_eval import load_scene_model
    m = load_scene_model("flat")
    scene = mujoco.MjvScene(m, maxgeom=100)
    qpos = np.zeros(m.nq); qpos[3] = 1.0
    qvel = np.zeros(m.nv); qvel[1] = 1.0
    vw.draw_arrows_into_scene(scene, qpos, qvel, (0.8, 0.2))
    assert scene.ngeom == 2
    assert scene.geoms[0].type == mujoco.mjtGeom.mjGEOM_ARROW

