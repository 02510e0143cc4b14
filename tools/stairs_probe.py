"""Stairs-ascent probe: quantify the riser-snap contact fix (STATUS r5 gap).

Runs a trained policy (default: the committed flagship artifact
doc/evidence/go2_moe_cts_r5_75k.pt) inside the TRAINING engine
(env/go2_env.py + sim/tengine.py) on pure stairs_up terrain at FIXED
terrain levels, with a constant forward command, and reports per-level
survival and forward progress. `--ab` additionally re-runs with the riser
snap disabled (ops/terrain_patches.RISER_SLOPE_THRESHOLD -> inf, i.e. the
pre-fix tilted-normal contact) so the fix's effect is measured directly.

Background (STATUS r5 "stairs_up pinned at ~3.1"): a stair riser in the
heightfield presents a central-difference contact normal tilted by
atan(step/0.2) — level 5: 40 deg, level 7: 47 deg — so ascent contacts
fight a tilted friction cone the reference's PhysX trimesh (vertical
risers + flat treads, slope_treshold=0.75 correction,
legged_robot_config.py:40) never produces. The snap restores tread-normal
contact at risers.

Usage:
    python tools/stairs_probe.py [--levels 2 4 6 8] [--steps 400] [--ab]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_env(task, n_envs):
    from go2_rl_gym_tpu.utils import registry
    env_cfg, train_cfg = registry.get_cfgs(task)
    env_cfg.env.num_envs = n_envs
    env_cfg.terrain.mesh_type = "heightfield"
    # pure stairs_up columns; difficulty = row/num_rows (terrain curriculum
    # layout), so terrain_levels select riser height directly
    env_cfg.terrain.terrain_proportions = (0.0, 0.0, 0.0, 1.0, 0.0,
                                           0.0, 0.0, 0.0, 0.0)
    env_cfg.terrain.curriculum = True
    env_cfg.terrain.num_rows = 10
    env_cfg.terrain.num_cols = 4
    # deterministic contact conditions (play-mode overrides, play.py:43-50)
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.domain_rand.randomize_action_delay = False
    env = registry.make_env(task, env_cfg)
    return env, train_cfg


def load_policy(env, train_cfg, pt_path):
    import jax
    import jax.numpy as jnp
    from go2_rl_gym_tpu.agents.cts import ALGO_TO_FAMILY
    from go2_rl_gym_tpu.agents.networks import make_cts_model
    from go2_rl_gym_tpu.export import importer

    family = ALGO_TO_FAMILY[train_cfg.runner.algorithm_class_name]
    partial = importer.import_policy_from_pt(pt_path, family)
    params = importer.complete_params(
        partial, family, train_cfg.policy, num_obs=env.num_obs,
        num_critic_obs=env.num_privileged_obs, num_actions=12,
        history_length=train_cfg.history_length)
    params = jax.tree.map(jnp.asarray, params)
    model = make_cts_model(family, env.num_obs, env.num_privileged_obs, 12,
                           train_cfg.policy, train_cfg.history_length)
    return model, params, train_cfg.history_length


def probe_level(env, model, params, hist_len, level, steps, vx, seed=0):
    """Fixed-level rollout; returns survival fraction and x-progress stats."""
    import jax
    import jax.numpy as jnp

    N = env.num_envs

    @jax.jit
    def roll(state, obs, history, lvl):
        lvl_arr = jnp.full((N,), lvl, jnp.int32)
        state = state._replace(
            terrain_levels=lvl_arr,
            env_origins=env.terrain_origins[lvl_arr, state.terrain_types],
            commands=state.commands.at[:, 0].set(vx).at[:, 1:].set(0.0))
        hist_flat = history.reshape(N, -1)
        latent, _ = model.apply(params, hist_flat, method="s_latent")
        mu, _, _ = model.apply(params, latent, obs, method="dist")
        state, out = env.step(state, mu)
        history = jnp.where(out.done[:, None, None], 0.0, history)
        history = jnp.concatenate([history[:, 1:], out.obs[:, None]], axis=1)
        x_rel = state.sim.base_pos[:, 0] - state.env_origins[:, 0]
        return state, out.obs, history, out.done, x_rel

    key = jax.random.PRNGKey(seed)
    state = env.init_state(key)
    # teleport every robot onto the target row (init_state spreads spawns
    # over the init-curriculum levels), preserving the spawn offset
    import jax.numpy as jnp
    lvl = jnp.asarray(level, jnp.int32)
    lvl_arr = jnp.full((N,), level, jnp.int32)
    new_org = env.terrain_origins[lvl_arr, state.terrain_types]
    delta = new_org - state.env_origins
    state = state._replace(
        terrain_levels=lvl_arr, env_origins=new_org,
        sim=state.sim._replace(base_pos=state.sim.base_pos + delta))
    obs = jnp.zeros((N, env.num_obs))
    history = jnp.zeros((N, hist_len, env.num_obs))
    state, obs, history, _, _ = roll(state, obs, history, lvl)

    ever_done = np.zeros(N, bool)
    best_x = np.zeros(N, np.float32)
    for t in range(steps):
        state, obs, history, done, x_rel = roll(state, obs, history, lvl)
        d = np.asarray(done)
        x = np.asarray(x_rel)
        alive = ~ever_done
        best_x[alive] = np.maximum(best_x[alive], x[alive])
        ever_done |= d
    return dict(level=int(level),
                survival=float((~ever_done).mean()),
                mean_progress_m=float(best_x.mean()),
                p90_progress_m=float(np.percentile(best_x, 90)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="go2_moe_cts")
    ap.add_argument("--policy", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "doc", "evidence", "go2_moe_cts_r5_75k.pt"))
    ap.add_argument("--levels", type=int, nargs="+", default=[2, 4, 6, 8])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--num_envs", type=int, default=128)
    ap.add_argument("--vx", type=float, default=0.6)
    ap.add_argument("--ab", action="store_true",
                    help="also run with the riser snap DISABLED (pre-fix "
                         "tilted-normal contact) for an A/B comparison")
    ap.add_argument("--out", default=None, help="write results jsonl here")
    args = ap.parse_args()

    from go2_rl_gym_tpu.ops import terrain_patches as tp
    results = []
    modes = [("riser_snap", tp.RISER_SLOPE_THRESHOLD)]
    if args.ab:
        modes.append(("no_snap", float("inf")))
    orig = tp.RISER_SLOPE_THRESHOLD
    for mode, thresh in modes:
        tp.RISER_SLOPE_THRESHOLD = thresh   # read at terrain build + trace
        try:
            env, train_cfg = build_env(args.task, args.num_envs)
            model, params, hist_len = load_policy(env, train_cfg, args.policy)
            for lvl in args.levels:
                r = probe_level(env, model, params, hist_len, lvl,
                                args.steps, args.vx)
                r["mode"] = mode
                results.append(r)
                print(json.dumps(r))
        finally:
            tp.RISER_SLOPE_THRESHOLD = orig
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
