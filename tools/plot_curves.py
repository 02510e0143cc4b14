"""Plot training curves from a run dir's metrics.jsonl.

Usage: python tools/plot_curves.py <run_dir> [<run_dir2> ...] [--out curves.png]

Produces a grid: mean reward, episode length, value loss, terrain levels,
learning rate, FPS — the counterpart of eyeballing the reference's
TensorBoard (reference on_policy_runner.py:204-285 logs the same tags).
"""
import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(run_dir):
    vals = collections.defaultdict(list)
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            vals[r["tag"]].append((r["step"], r["value"]))
    return vals


PANELS = [
    ("reward", ["Train/mean_reward", "Train/mean_teacher_reward",
                "Train/mean_student_reward"]),
    ("episode length [steps]", ["Train/mean_episode_length",
                                "Train/mean_teacher_episode_length",
                                "Train/mean_student_episode_length"]),
    ("value loss", ["Loss/value"]),
    ("surrogate / latent loss", ["Loss/surrogate", "Loss/latent"]),
    ("terrain level", None),          # all Terrain/* tags
    ("perf [env-steps/s]", ["Perf/total_fps"]),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dirs", nargs="+")
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    axes = axes.ravel()
    for run_dir in args.run_dirs:
        vals = load(run_dir)
        name = os.path.basename(os.path.dirname(run_dir.rstrip("/")))
        for ax, (title, tags) in zip(axes, PANELS):
            if tags is None:
                tags = sorted(t for t in vals if t.startswith("Terrain/"))
            for tag in tags:
                if tag not in vals:
                    continue
                xs, ys = zip(*vals[tag])
                label = f"{name}:{tag.split('/')[-1]}" \
                    if len(args.run_dirs) > 1 or tags is None or len(tags) > 1 \
                    else name
                ax.plot(xs, ys, label=label, linewidth=1.0)
            ax.set_title(title)
            ax.grid(alpha=0.3)
            if title == "value loss":
                ax.set_yscale("log")
    for ax in axes:
        if ax.lines:
            ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
