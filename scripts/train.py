"""Training entry point.

Counterpart of reference legged_gym/scripts/train.py + the CLI flag schema of
legged_gym/utils/helpers.py:128-157.

Usage:
    python scripts/train.py --task go2_moe_cts --num_envs 4096 \
        --max_iterations 150000 --headless
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go2", help="task name")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--experiment_name", default=None)
    p.add_argument("--run_name", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load_run", default=-1)
    p.add_argument("--checkpoint", type=int, default=-1)
    p.add_argument("--log_root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "logs"))
    p.add_argument("--terrain", default=None,
                   choices=[None, "plane", "heightfield"],
                   help="override terrain mesh type")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (cpu for debugging)")
    p.add_argument("--headless", action="store_true", help="accepted for CLI "
                   "parity with the reference; rendering is always off")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax NaN checking (slow; for debugging)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of iterations 10-12")
    p.add_argument("--eval_interval", type=int, default=0,
                   help="run async MuJoCo sim2sim eval every N iterations")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host TPU slice)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="shard envs over this many devices (default: all "
                        "when >1 device is visible)")
    return p.parse_args()


def main():
    args = get_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        # must run before ANY device use (make_env uploads terrain arrays)
        from go2_rl_gym_tpu.distributed.mesh import initialize_multihost
        initialize_multihost()
    from go2_rl_gym_tpu.utils.helpers import enable_compilation_cache
    enable_compilation_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from go2_rl_gym_tpu.utils import registry
    from go2_rl_gym_tpu.utils.helpers import (get_load_path,
                                              update_cfg_from_args)

    env_cfg, train_cfg = registry.get_cfgs(args.task)
    update_cfg_from_args(env_cfg, train_cfg, args)

    env = registry.make_env(args.task, env_cfg,
                            num_steps_per_env=train_cfg.runner.num_steps_per_env)
    runner = registry.make_runner(args.task, env, train_cfg,
                                  log_root=args.log_root,
                                  run_name=args.run_name)
    if args.eval_interval:
        runner.eval_interval = args.eval_interval
        from go2_rl_gym_tpu.train.eval_hook import AsyncEvaluator
        runner.evaluator = AsyncEvaluator(runner.log_dir)

    key = jax.random.PRNGKey(train_cfg.seed)
    if args.num_devices or args.multihost or len(jax.devices()) > 1:
        # mesh FIRST: init_runner_state then builds the state already sharded
        # (each process materializes only its addressable shards — required
        # for multi-host where the full state may not fit one host)
        runner.attach_mesh(n_devices=args.num_devices)
        print(f"data-parallel over {len(runner.mesh.devices.flat)} devices, "
              f"process {jax.process_index()}/{jax.process_count()}")
    rs = runner.init_runner_state(key, init_at_random_ep_len=True)
    if args.resume:
        path = get_load_path(os.path.join(args.log_root,
                                          train_cfg.runner.experiment_name),
                             args.load_run, args.checkpoint)
        print(f"resuming from {path}")
        rs = runner.load(rs, path)

    if args.profile_dir:
        rs = runner.learn(rs, 10)
        with jax.profiler.trace(args.profile_dir):
            rs = runner.learn(rs, 3)
        runner.learn(rs, train_cfg.runner.max_iterations - 13)
    else:
        runner.learn(rs, train_cfg.runner.max_iterations)


if __name__ == "__main__":
    main()
