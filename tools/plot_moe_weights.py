"""Plot MoE gating-weight traces recorded during sim2sim evaluation.

Headless counterpart of the reference's live MoE-weight HUD
(deploy_go2.py --visualize-moe-weights / deploy_go2_moe.py): consumes the
.npz produced by TorchPolicy(record_moe=True).save_moe_traces and writes a
PNG with per-expert weight timelines + a mean-usage bar chart.

Usage: python tools/plot_moe_weights.py traces.npz [-o weights.png]
"""
import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(args.npz)
    w = data["weights"]                      # (T, E)
    T, E = w.shape
    t = np.arange(T) * 0.02                  # 50 Hz policy

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 6),
                                   gridspec_kw={"height_ratios": [2, 1]})
    for e in range(E):
        ax1.plot(t, w[:, e], label=f"expert {e}", linewidth=0.8)
    ax1.set_xlabel("time [s]")
    ax1.set_ylabel("gating weight")
    ax1.legend(ncol=4, fontsize=7)
    ax1.set_title("MoE gating weights over the episode")

    ax2.bar(np.arange(E), w.mean(0))
    ax2.axhline(1.0 / E, color="k", linestyle="--", linewidth=0.8,
                label="uniform")
    ax2.set_xlabel("expert")
    ax2.set_ylabel("mean usage")
    ax2.legend(fontsize=7)

    out = args.output or args.npz.replace(".npz", ".png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({T} steps, {E} experts, "
          f"usage std {w.mean(0).std():.3f})")


if __name__ == "__main__":
    main()
