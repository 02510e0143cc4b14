"""Merge training metrics + sim2sim eval results into one CSV per run.

Counterpart of reference tools/logs_merge.py:27-115 (raw-protobuf TensorBoard
event reader + RoboGauge YAML join). This framework mirrors every scalar into
``metrics.jsonl`` (train/metrics.py), so no protobuf parsing is needed; eval
results live in ``eval_results/*.yaml`` written by scripts/evaluate.py.

Usage: python tools/logs_merge.py logs/go2_moe_cts/<run> [-o out.csv]
"""
import argparse
import csv
import json
import os
import sys
from collections import defaultdict


def load_metrics(run_dir):
    rows = defaultdict(dict)
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            rows[rec["step"]][rec["tag"]] = rec["value"]
    return rows


def load_eval_results(run_dir):
    try:
        import yaml
    except ImportError:
        return {}
    out = {}
    d = os.path.join(run_dir, "eval_results")
    if not os.path.isdir(d):
        return out
    for fname in os.listdir(d):
        if fname.startswith("results_") and fname.endswith(".yaml"):
            step = int(fname[len("results_"):-len(".yaml")])
            with open(os.path.join(d, fname)) as f:
                res = yaml.safe_load(f)
            out[step] = {f"Eval/{k}": v for k, v in res.items()
                         if isinstance(v, (int, float))}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    rows = load_metrics(args.run_dir)
    for step, scores in load_eval_results(args.run_dir).items():
        rows[step].update(scores)

    tags = sorted({t for r in rows.values() for t in r})
    out_path = args.output or os.path.join(args.run_dir, "merged.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step"] + tags)
        for step in sorted(rows):
            w.writerow([step] + [rows[step].get(t, "") for t in tags])
    print(f"wrote {out_path} ({len(rows)} steps x {len(tags)} tags)")


if __name__ == "__main__":
    main()
