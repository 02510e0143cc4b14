"""Decompose flagship-bench time: physics vs env step vs rollout vs update.

Usage: python tools/bench_decompose.py [stage ...]
Stages: physics env rollout train. Default: env physics.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    from go2_rl_gym_tpu.utils.helpers import enable_compilation_cache
    enable_compilation_cache()
    from go2_rl_gym_tpu.env.config import Go2Cfg, go2_moe_cts_train_cfg
    from go2_rl_gym_tpu.env.go2_env import Go2Env
    from go2_rl_gym_tpu.train.runner import OnPolicyRunner

    stages = sys.argv[1:] or ["env", "physics"]
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))

    cfg = Go2Cfg()
    cfg.env.num_envs = num_envs
    tc = go2_moe_cts_train_cfg()
    env = Go2Env(cfg, num_steps_per_env=tc.runner.num_steps_per_env)

    key = jax.random.PRNGKey(0)
    state = jax.jit(env.init_state)(key)
    actions = jnp.zeros((num_envs, 12), jnp.float32)

    if "physics" in stages:
        # raw physics: decimated step on rough terrain
        targets = jnp.zeros((4, num_envs, 12), jnp.float32)
        kp = jnp.full((num_envs, 12), 20.0)
        kd = jnp.full((num_envs, 12), 0.5)
        ms_ = jnp.ones((num_envs, 12))
        mo = jnp.zeros((num_envs, 12))
        pstep = jax.jit(lambda d, s: env.physics_step(
            d, s, targets, kp, kd, ms_, mo))
        ms = timeit(pstep, state.dyn, state.sim)
        print(f"physics 4-substep:  {ms:8.2f} ms  "
              f"({num_envs/ms*1e3:,.0f} env-steps/s)")

    if "env" in stages:
        estep = jax.jit(env.step)
        ms = timeit(estep, state, actions)
        print(f"full env.step:      {ms:8.2f} ms  "
              f"({num_envs/ms*1e3:,.0f} env-steps/s)")

    if "rollout" in stages or "train" in stages:
        runner = OnPolicyRunner(env, tc, log_dir=None)
        rs = runner.init_runner_state(key, init_at_random_ep_len=True)

    if "train" in stages:
        def tstep(rs):
            rs2, m = runner._train_step(rs)
            return rs2
        ms = timeit(tstep, rs, iters=5)
        T = tc.runner.num_steps_per_env
        print(f"full train step:    {ms:8.2f} ms  "
              f"({T*num_envs/ms*1e3:,.0f} env-steps/s)  [T={T}]")


if __name__ == "__main__":
    main()
