#!/bin/bash
# Watchdog for long training runs through the axon TPU relay: the relay
# occasionally wedges an RPC stream (trainer blocks forever on a read).
# Restart the trainer from the newest checkpoint whenever the newest run's
# metrics.jsonl goes stale for >6 minutes. Exact orbax resume makes the
# restart lossless back to the last save_interval.
#
# Both probes are scoped to run directories whose name ends in _$RUN_NAME
# (each restart creates a fresh <date>_$RUN_NAME dir) so an unrelated older
# run in the same experiment can neither satisfy the target early nor be
# resumed from by mistake (ADVICE r4).
#
# Usage: tools/train_watchdog.sh <task> <num_envs> <target_total_iters> <run_name> [extra train.py args...]
set -u
TASK=$1; ENVS=$2; TARGET=$3; RUN_NAME=$4; shift 4
cd "$(dirname "$0")/.."
# EXP_NAME env var overrides the experiment dir (default: task name) — used
# by the per-family sweeps to train FRESH in an empty experiment instead of
# bootstrapping from an older run of the same task
EXP_NAME="${EXP_NAME:-$TASK}"
EXP_DIR="logs/$EXP_NAME"

latest_ckpt_iter() {
  # completed checkpoints only (skip orbax .orbax-checkpoint-tmp dirs)
  find "$EXP_DIR" -maxdepth 2 -path "*_${RUN_NAME}/model_*" -name 'model_*' \
      2>/dev/null | grep -E 'model_[0-9]+$' \
    | sed 's/.*model_//' | sort -n | tail -1
}

global_ckpt_iter() {
  # bootstrap case: continuing an earlier chain under a NEW run name — the
  # trainer's own --resume resolution (get_load_path, newest run with
  # checkpoints) does the cross-run resume; this just sizes REMAIN.
  find "$EXP_DIR" -maxdepth 2 -name 'model_*' 2>/dev/null \
    | grep -E 'model_[0-9]+$' | sed 's/.*model_//' | sort -n | tail -1
}

newest_metrics() {
  ls -t "$EXP_DIR"/*_"$RUN_NAME"/metrics.jsonl 2>/dev/null | head -1
}

while true; do
  LAST=$(latest_ckpt_iter)
  RESUME_FLAG="--resume"
  if [ -z "$LAST" ]; then
    LAST=$(global_ckpt_iter)
    if [ -z "$LAST" ]; then LAST=0; RESUME_FLAG=""; fi
  fi
  REMAIN=$((TARGET - LAST))
  if [ "$REMAIN" -le 0 ]; then echo "watchdog: target $TARGET reached"; break; fi
  echo "watchdog: starting (resume from $LAST, $REMAIN to go)"
  python scripts/train.py --task "$TASK" --num_envs "$ENVS" \
      --max_iterations "$REMAIN" --headless --experiment_name "$EXP_NAME" \
      --run_name "$RUN_NAME" $RESUME_FLAG "$@" &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NEWEST=$(newest_metrics)
    NOW=$(date +%s)
    # Staleness is judged against max(newest metrics write, process start):
    # a metrics file from a PREVIOUS run segment must not count against a
    # fresh child that is still compiling (a config change invalidates the
    # XLA compilation cache and a cold compile takes ~10 min).
    REF=$START
    if [ -n "$NEWEST" ]; then
      MT=$(stat -c %Y "$NEWEST")
      if [ "$MT" -gt "$REF" ]; then REF=$MT; fi
    fi
    AGE=$((NOW - REF))
    LIMIT=360
    # Compile grace: a fresh child logs iteration 0 quickly (eager init)
    # and THEN cold-compiles the big chunked train-step graph (>6 min
    # after an engine change invalidates the XLA cache). That it-0
    # metrics write must not cancel the grace — so the grace holds for
    # the child's first 1500 s unconditionally, not just while the
    # metrics file predates the child.
    if [ $((NOW - START)) -lt 1500 ]; then LIMIT=1500; fi
    if [ "$AGE" -gt "$LIMIT" ]; then
      echo "watchdog: stale ${AGE}s (limit $LIMIT) — killing $PID for restart"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  sleep 5
done
