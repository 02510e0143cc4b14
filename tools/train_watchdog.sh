#!/bin/bash
# Watchdog for long training runs through the axon TPU relay: the relay
# occasionally wedges an RPC stream (trainer blocks forever on a read).
# Restart the trainer from the newest checkpoint whenever the newest run's
# metrics.jsonl goes stale for >6 minutes. Exact orbax resume makes the
# restart lossless back to the last save_interval.
#
# Usage: tools/train_watchdog.sh <task> <num_envs> <target_total_iters> <run_name>
set -u
TASK=$1; ENVS=$2; TARGET=$3; RUN_NAME=$4
cd "$(dirname "$0")/.."
EXP_DIR="logs/$TASK"

latest_ckpt_iter() {
  # completed checkpoints only (skip orbax .orbax-checkpoint-tmp dirs)
  ls -d $EXP_DIR/*/model_* 2>/dev/null | grep -E 'model_[0-9]+$' \
    | sed 's/.*model_//' | sort -n | tail -1
}

while true; do
  LAST=$(latest_ckpt_iter); LAST=${LAST:-0}
  REMAIN=$((TARGET - LAST))
  if [ "$REMAIN" -le 0 ]; then echo "watchdog: target $TARGET reached"; break; fi
  echo "watchdog: starting (resume from $LAST, $REMAIN to go)"
  python scripts/train.py --task "$TASK" --num_envs "$ENVS" \
      --max_iterations "$REMAIN" --headless --experiment_name "$TASK" \
      --run_name "$RUN_NAME" --resume &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NEWEST=$(ls -t $EXP_DIR/*/metrics.jsonl 2>/dev/null | head -1)
    if [ -n "$NEWEST" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$NEWEST") ))
      if [ "$AGE" -gt 360 ]; then
        echo "watchdog: metrics stale ${AGE}s — killing $PID for restart"
        kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
        break
      fi
    fi
  done
  wait $PID 2>/dev/null
  sleep 5
done
