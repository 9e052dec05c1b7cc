#!/bin/bash
# ECRot-scale window-time experiment matrix (VERDICT round-2 item 2).
# Run when the TPU tunnel is up:  bash examples/tpu_ecrot_matrix.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/ecrot_matrix.log
: > "$LOG"
for prec in highest default; do
  for ladder in sequential vector grid; do
    echo "=== precision=$prec ladder=$ladder ===" | tee -a "$LOG"
    ECROT_PRECISION=$prec ECROT_LADDER=$ladder \
      timeout 1800 python examples/tpu_ecrot_scale_check.py 2>&1 \
      | grep -E "backend solves|windows=|RMS|OK|Error" | tee -a "$LOG"
  done
done
echo "full log: $LOG"
