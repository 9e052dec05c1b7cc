#!/bin/bash
# Realtime-replay experiment matrix (VERDICT round-2 item 1).
# Run when the TPU tunnel is up:  bash examples/tpu_rt_matrix.sh
# Each cell prints the tpu_realtime_check JSON stats line; best-of config
# becomes the ijrr replay default. ~4 min/cell warm (one compile pass first).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/rt_matrix.log
: > "$LOG"
for prec in highest default; do
  for ladder in sequential vector grid; do
    echo "=== precision=$prec ladder=$ladder ===" | tee -a "$LOG"
    RT_PRECISION=$prec RT_BA_LADDER=$ladder \
      timeout 1200 python examples/tpu_realtime_check.py 2>&1 \
      | grep -E '"realtime_factor"|"wall_s"|backend|RMS|OK:|AssertionError' \
      | tee -a "$LOG"
  done
done
echo "full log: $LOG"
