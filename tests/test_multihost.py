"""Real multi-PROCESS data parallelism: 2 processes x 4 virtual CPU devices
stitched by jax.distributed + Gloo into one 8-device mesh (the CPU-testable
analogue of a 2-host TPU slice; SURVEY.md §2.5/§2.6 — the reference has no
working multi-device path at all).

Checks: sharded-at-init state (no process holds full arrays), both processes
compute identical losses, and those equal a single-process 8-device run of
the same program (partitioning must not change the math).
"""
import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    losses = {}
    for out in outs:
        m = re.search(r"MHLOSS (\d) ([\d.e+-]+) ([\d.e+-]+)", out)
        assert m, out[-3000:]
        losses[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(losses) == {0, 1}
    # both processes see the same global losses
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    assert all(np.isfinite(v) for v in losses[0])

    # single-process 8-device reference run of the same program
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the reference run")
    from go2_rl_gym_tpu.env.config import Go2Cfg, go2_ppo_train_cfg
    from go2_rl_gym_tpu.env.go2_env import Go2Env
    from go2_rl_gym_tpu.train.runner import OnPolicyRunner
    cfg = Go2Cfg()
    cfg.env.num_envs = 16
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    tc = go2_ppo_train_cfg()
    tc.runner.num_steps_per_env = 4
    env1 = Go2Env(cfg, num_steps_per_env=4)
    runner = OnPolicyRunner(env1, tc, log_dir=None)
    runner.attach_mesh()
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    ref = []
    for _ in range(2):
        rs, metrics = runner._train_step(rs)
        ref.append(float(metrics["value_loss"]))
    np.testing.assert_allclose(ref, losses[0], rtol=2e-4)
