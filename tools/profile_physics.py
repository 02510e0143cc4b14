"""Capture a TPU trace of the physics step and print the top ops by time.

Usage: python tools/profile_physics.py [env|physics|train]
"""
import glob
import gzip
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_and_trace(fn, args, trace_dir):
    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)


def summarize(trace_dir, top=40):
    import json
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace.json.gz under {trace_dir}"
    tot = defaultdict(float)
    for f in files:
        data = json.loads(gzip.open(f).read())
        # find device-track pids (TPU ops live on "/device:TPU:x" tracks)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, n in pid_names.items()
                    if "TPU" in n or "device" in n.lower()}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            tot[ev["name"]] += ev.get("dur", 0) / 1e3  # us -> ms
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"total device op time: {total:.2f} ms (3 iters)")
    for name, ms in items[:top]:
        print(f"{ms:9.3f} ms  {100*ms/total:5.1f}%  {name[:140]}")


def main():
    from go2_rl_gym_tpu.utils.helpers import enable_compilation_cache
    enable_compilation_cache()
    from go2_rl_gym_tpu.env.config import Go2Cfg, go2_moe_cts_train_cfg
    from go2_rl_gym_tpu.env.go2_env import Go2Env

    which = sys.argv[1] if len(sys.argv) > 1 else "physics"
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = Go2Cfg()
    cfg.env.num_envs = num_envs
    tc = go2_moe_cts_train_cfg()
    env = Go2Env(cfg, num_steps_per_env=tc.runner.num_steps_per_env)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.init_state)(key)

    trace_dir = f"/tmp/trace_{which}"
    os.system(f"rm -rf {trace_dir}")

    if which == "physics":
        targets = jnp.zeros((4, num_envs, 12), jnp.float32)
        kp = jnp.full((num_envs, 12), 20.0)
        kd = jnp.full((num_envs, 12), 0.5)
        f = jax.jit(lambda d, s: env.physics_step(
            d, s, targets, kp, kd, jnp.ones((num_envs, 12)),
            jnp.zeros((num_envs, 12))))
        run_and_trace(f, (state.dyn, state.sim), trace_dir)
    elif which == "env":
        f = jax.jit(env.step)
        run_and_trace(f, (state, jnp.zeros((num_envs, 12))), trace_dir)
    elif which == "train":
        from go2_rl_gym_tpu.train.runner import OnPolicyRunner
        runner = OnPolicyRunner(env, tc, log_dir=None)
        rs = runner.init_runner_state(key, init_at_random_ep_len=True)
        f = lambda r: runner._train_step(r)[0]
        run_and_trace(f, (rs,), trace_dir)

    summarize(trace_dir)


if __name__ == "__main__":
    main()
