"""Load a trained checkpoint, export policies, run an inference rollout.

Counterpart of reference legged_gym/scripts/play.py:15-70: caps the env count,
disables noise/DR/pushes/curriculum, loads the latest checkpoint, exports
TorchScript + pkl (+ONNX when available), then rolls the policy with a fixed
command [1, 0, 0].
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go2_moe_cts")
    p.add_argument("--experiment_name", default=None,
                   help="override the experiment dir under log_root "
                        "(reference helpers.py flag schema)")
    p.add_argument("--load_run", default=-1)
    p.add_argument("--checkpoint", type=int, default=-1)
    p.add_argument("--log_root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "logs"))
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from go2_rl_gym_tpu.agents.cts import ALGO_TO_FAMILY
    from go2_rl_gym_tpu.export import exporter
    from go2_rl_gym_tpu.utils import registry
    from go2_rl_gym_tpu.utils.helpers import get_load_path

    env_cfg, train_cfg = registry.get_cfgs(args.task)
    # play-mode overrides (reference play.py:16-28)
    env_cfg.env.num_envs = min(env_cfg.env.num_envs, 16)
    env_cfg.terrain.num_rows = 5
    env_cfg.terrain.num_cols = 5
    env_cfg.terrain.curriculum = False
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.domain_rand.randomize_action_delay = False

    env = registry.make_env(args.task, env_cfg)
    runner = registry.make_runner(args.task, env, train_cfg, log_root=None)
    rs = runner.init_runner_state(jax.random.PRNGKey(0))

    run_root = os.path.join(args.log_root, args.experiment_name
                            or train_cfg.runner.experiment_name)
    path = get_load_path(run_root, args.load_run, args.checkpoint)
    print(f"loading {path}")
    # params-only restore: training checkpoints carry env-count-shaped state
    # that must not constrain the play session (reference play.py:38-40)
    params = runner.load_params(path)
    run_dir = os.path.dirname(path)
    export_dir = os.path.join(run_dir, "exported", "policies")
    algo = train_cfg.runner.algorithm_class_name
    if algo != "PPO":
        family = ALGO_TO_FAMILY[algo]
        jit_path = exporter.export_policy_as_jit(
            params, family, export_dir, num_obs=env.num_obs,
            history_length=train_cfg.history_length,
            obs_no_goal_mask=train_cfg.policy.obs_no_goal_mask)
        print(f"exported TorchScript: {jit_path}")
        onnx_path = exporter.export_policy_as_onnx(
            params, family, export_dir, num_obs=env.num_obs,
            history_length=train_cfg.history_length,
            obs_no_goal_mask=train_cfg.policy.obs_no_goal_mask)
        print(f"exported ONNX: {onnx_path}")
    pkl_path = exporter.export_policy_as_pkl(
        params, {"task": args.task, "algorithm": algo}, export_dir)
    print(f"exported pkl: {pkl_path}")

    # inference rollout with fixed command [1, 0, 0] (reference play.py:54-62)
    step = jax.jit(env.step)
    state = rs.env_state
    history = rs.history
    obs = rs.obs
    alg = runner.alg
    total_rew = 0.0
    for i in range(args.steps):
        state = state._replace(
            commands=state.commands.at[:, 0].set(1.0).at[:, 1:3].set(0.0))
        hist_flat = history.reshape(history.shape[0], -1)
        if runner.is_cts:
            latent, _ = alg.model.apply(params, hist_flat, method="s_latent")
            mu, _, _ = alg.model.apply(params, latent, obs, method="dist")
        else:
            mu, _ = alg.model.apply(params, obs, method="actor_dist")
        state, out = step(state, mu)
        obs = out.obs
        history = jnp.where(out.done[:, None, None], 0.0, history)
        history = jnp.concatenate([history[:, 1:], obs[:, None]], axis=1)
        total_rew += float(out.rew.mean())
    print(f"{args.steps}-step rollout: mean reward/step "
          f"{total_rew / args.steps:.4f}")


if __name__ == "__main__":
    main()
