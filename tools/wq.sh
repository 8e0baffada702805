#!/bin/bash
# Submit a snippet to the warm TPU worker queue and wait for its output.
# Usage: tools/wq.sh <name> <file.py> [timeout_s]
set -u
Q=${TPU_WORKER_QUEUE:-/tmp/tpuq}
NAME=$1
SRC=$2
TMO=${3:-900}
# unique id per submission: a timed-out job of the same name may STILL be
# running in the worker, and would otherwise write DONE/OUT files that the
# next same-name wait loop mistakes for its own result
ID=$(date +%s)_$$
JOB="$Q/50_${NAME}_${ID}.py"
DONE="$Q/50_${NAME}_${ID}.done"
OUT="$Q/50_${NAME}_${ID}.out"
cp "$SRC" "$JOB.tmp" && mv "$JOB.tmp" "$JOB"
t0=$(date +%s)
while [ ! -f "$DONE" ]; do
  if [ $(( $(date +%s) - t0 )) -gt "$TMO" ]; then
    echo "wq: TIMEOUT after ${TMO}s (job may still be running)"; exit 124
  fi
  sleep 2
done
cat "$OUT"
rm -f "$DONE" "$OUT"
