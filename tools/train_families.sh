#!/bin/bash
# Sequential training sweep over the five non-flagship CTS families for the
# six-row score table (reference README.md:56-67; VERDICT r4 next#2), each
# under the relay watchdog, each in a FRESH experiment dir (EXP_NAME
# override) so nothing bootstraps from older runs. After each run the policy
# is exported (CPU) and scored on the 5-scene extended sweep in the
# background while the next family trains on the chip.
#
# Usage: tools/train_families.sh [iters] [envs]
set -u
ITERS=${1:-10000}
ENVS=${2:-2048}
cd "$(dirname "$0")/.."

for TASK in go2_cts go2_moe_ng_cts go2_mcp_cts go2_ac_moe_cts go2_dual_moe_cts; do
  EXP="r5_fam_${TASK#go2_}"
  echo "=== $TASK -> logs/$EXP ($ITERS iters, $ENVS envs) ==="
  EXP_NAME="$EXP" tools/train_watchdog.sh "$TASK" "$ENVS" "$ITERS" r5
  # export + evaluate on CPU concurrently with the next family's training
  (
    python scripts/play.py --task "$TASK" --platform cpu \
        --experiment_name "$EXP" --log_root logs --steps 0 \
        2>&1 | tail -5 > "logs/$EXP/export.log"
    JIT=$(ls -t logs/$EXP/*/exported/policies/policy_jit*.pt 2>/dev/null | head -1)
    if [ -n "$JIT" ]; then
      python scripts/evaluate.py --policy "$JIT" \
          --scenes flat stairs race_track cross_stairs cross_slope \
          --extended --out "doc/evidence/eval_r5_${TASK}_${ITERS}.yaml" \
          > "logs/$EXP/eval.log" 2>&1
    fi
  ) &
done
wait
echo "family sweep complete"
