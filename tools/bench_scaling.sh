#!/bin/bash
# One-chip env-count scaling curve for the flagship train step (VERDICT r4
# next#5: BASELINE's 5M aggregate env-steps/s assumes 16k envs shard
# cleanly). Runs bench.py at 2048/4096/8192/16384 envs and appends each JSON
# line to doc/evidence/bench_scaling.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=doc/evidence/bench_scaling.jsonl
: > "$OUT"
for N in 2048 4096 8192 16384; do
  echo "=== BENCH_NUM_ENVS=$N ==="
  BENCH_NUM_ENVS=$N python bench.py | tail -1 | sed "s/^/{\"num_envs\": $N, \"bench\": /; s/$/}/" >> "$OUT"
done
cat "$OUT"
