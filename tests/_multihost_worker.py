"""Subprocess worker for the 2-process multi-host test (test_multihost.py).

Each worker owns 4 virtual CPU devices; jax.distributed + Gloo collectives
stitch them into one 8-device global mesh. The worker builds the RunnerState
SHARDED-AT-INIT (runner.attach_mesh first, init_runner_state after — the
multi-host protocol of train/runner.py), runs two fused train steps, and
prints the resulting scalar losses for the parent to compare across
processes and against a single-process 8-device run.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    from go2_rl_gym_tpu.distributed.mesh import initialize_multihost
    initialize_multihost(coordinator=f"localhost:{port}", num_processes=2,
                         process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
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
    env = Go2Env(cfg, num_steps_per_env=4)
    runner = OnPolicyRunner(env, tc, log_dir=None)

    runner.attach_mesh()                       # global mesh over 8 devices
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    # per-process shards only: 16 envs / 8 devices = 2, x 4 local devices
    local = sum(s.data.shape[0] for s in rs.obs.addressable_shards)
    assert local == 8, local

    losses = []
    for _ in range(2):
        rs, metrics = runner._train_step(rs)
        losses.append(float(metrics["value_loss"]))
    print("MHLOSS", pid, " ".join(f"{v:.6e}" for v in losses), flush=True)


if __name__ == "__main__":
    main()
