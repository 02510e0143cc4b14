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


def summarize(trace_dir, top=40, iters=3):
    """SELF-time per op (nested spans subtracted from their parents —
    while-loop wrappers otherwise double-count their bodies), annotated with
    the source line XLA attributes the op to."""
    import json
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace.json.gz under {trace_dir}"
    self_t = defaultdict(float)
    src = {}
    for f in files:
        data = json.loads(gzip.open(f).read())
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, n in pid_names.items()
                    if "TPU" in n or "device" in n.lower()}
        tracks = defaultdict(list)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                tracks[(ev["pid"], ev.get("tid"))].append(ev)
                if "args" in ev and "source" in ev["args"]:
                    src.setdefault(ev["name"], ev["args"]["source"])
        for evs in tracks.values():
            evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
            stack = []
            for ev in evs:
                ts, dur = ev["ts"], ev.get("dur", 0)
                while stack and stack[-1][0] <= ts:
                    stack.pop()
                if stack:
                    self_t[stack[-1][1]] -= dur / 1e3
                self_t[ev["name"]] += dur / 1e3
                stack.append((ts + dur, ev["name"]))
    items = sorted(self_t.items(), key=lambda kv: -kv[1])
    total = sum(v for v in self_t.values() if v > 0)
    print(f"total device self time: {total/iters:.2f} ms/iter ({iters} iters)")
    for name, ms in items[:top]:
        where = src.get(name, "")
        print(f"{ms/iters:9.3f} ms  {100*ms/total:5.1f}%  {name[:60]:60s} {where[-60:]}")


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
