"""Learning-failure diagnostics (round-4 instrument, VERDICT.md next #1).

Probes the spawn->land->die pipeline that pins mean episode length at ~12
steps: runs zero-action and random-action rollouts on a flat plane and on
rough terrain with per-cause termination telemetry (base-contact vs bad-state
vs below-terrain vs timeout), base contact-force profiles and base height
traces.

Usage:
    python tools/diagnose_learning.py [--terrain plane|heightfield]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.env.go2_env import Go2Env
from go2_rl_gym_tpu.sim import engine
from go2_rl_gym_tpu.utils import registry


def make_env(terrain, n=64):
    env_cfg, train_cfg = registry.get_cfgs("go2")
    env_cfg.env.num_envs = n
    env_cfg.terrain.mesh_type = terrain
    if terrain != "plane":
        env_cfg.terrain.num_rows = 4
        env_cfg.terrain.num_cols = 4
    return Go2Env(env_cfg, num_steps_per_env=train_cfg.runner.num_steps_per_env)


def probe(env, policy, steps=200, label=""):
    N = env.num_envs
    key = jax.random.PRNGKey(0)
    state = env.init_state(key)

    @jax.jit
    def step_fn(state, k):
        actions = policy(state, k)
        return env.step(state, actions)

    # per-cause replication of the step's termination logic (outside jit ok)
    term_counts = {"contact": 0, "bad_finite": 0, "bad_speed": 0,
                   "below_terrain": 0, "timeout": 0}
    base_f_hist = []
    base_h_hist = []
    min_feet_h = []
    done_total = 0
    ep_lens = []
    cur_len = np.zeros(N, np.int64)
    for t in range(steps):
        k = jax.random.fold_in(jax.random.PRNGKey(123), t)
        # pre-step state for cause attribution
        state, out = step_fn(state, k)
        sim = state.sim
        cf = np.asarray(state.contact_forces)
        base_f = np.linalg.norm(cf[:, 0, :], axis=-1)
        contact_term = base_f > 1.0
        fin = ~(np.isfinite(np.asarray(sim.base_pos)).all(axis=1)
                & np.isfinite(np.asarray(sim.base_quat)).all(axis=1)
                & np.isfinite(np.asarray(sim.qd)).all(axis=1))
        speed = ((np.abs(np.asarray(sim.base_lin_vel)) >= 30.0).any(axis=1)
                 | (np.abs(np.asarray(sim.base_ang_vel)) >= 60.0).any(axis=1))
        ground_z = np.asarray(engine.terrain_height(
            env.terrain, state.sim.base_pos[:, :2]))
        # NOTE: state.sim is post-reset; for cause attribution we use the
        # done flags from out plus pre-reset cached outputs (contact_forces
        # is pre-reset cached). Approximate below-terrain via residual.
        done = np.asarray(out.done)
        to = np.asarray(out.time_outs)
        term_counts["contact"] += int((done & contact_term).sum())
        term_counts["timeout"] += int((done & to).sum())
        term_counts["bad_finite"] += int((done & fin).sum())
        term_counts["bad_speed"] += int((done & speed).sum())
        residual = done & ~contact_term & ~to & ~fin & ~speed
        term_counts["below_terrain"] += int(residual.sum())
        done_total += int(done.sum())
        cur_len += 1
        for i in np.nonzero(done)[0]:
            ep_lens.append(cur_len[i])
            cur_len[i] = 0
        base_f_hist.append(base_f)
        bp = np.asarray(sim.base_pos)
        base_h_hist.append(bp[:, 2] - ground_z)
        fp = np.asarray(state.foot_pos)
        min_feet_h.append(fp[:, :, 2].min(axis=1))

    base_f_hist = np.stack(base_f_hist)   # (T, N)
    base_h_hist = np.stack(base_h_hist)
    min_feet_h = np.stack(min_feet_h)
    print(f"\n=== {label} ({steps} steps x {N} envs) ===")
    print(f"  dones total: {done_total}  ({done_total/steps:.1f}/step)")
    print(f"  causes: {term_counts}")
    if ep_lens:
        print(f"  episode length: mean {np.mean(ep_lens):.1f} "
              f"median {np.median(ep_lens):.0f} max {np.max(ep_lens)}")
    marks = [t for t in (5, 20, 50, steps - 1) if t < steps]
    print("  base height (m): " + ", ".join(
        f"t={t} {base_h_hist[t].mean():.3f}" for t in marks))
    print(f"  base |F|: mean {base_f_hist.mean():.2f} N, "
          f"p99 {np.percentile(base_f_hist, 99):.2f} N, "
          f"max {base_f_hist.max():.2f} N, "
          f"frac>1N {(base_f_hist > 1.0).mean():.4f}")
    t_mid = min(20, steps - 1)
    print(f"  min foot z rel terrain-ish: t={t_mid} "
          f"{min_feet_h[t_mid].mean():.3f}")
    return term_counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--terrain", default="plane")
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    env = make_env(args.terrain)

    def zero_policy(state, k):
        return jnp.zeros((env.num_envs, 12))

    def random_policy(state, k):
        return jax.random.normal(k, (env.num_envs, 12))

    probe(env, zero_policy, args.steps, f"zero-action / {args.terrain}")
    probe(env, random_policy, args.steps, f"random-action(std=1) / {args.terrain}")


if __name__ == "__main__":
    main()
