#!/bin/bash
# Submit a snippet to the warm TPU worker queue and wait for its output.
# Usage: tools/wq.sh <name> <file.py> [timeout_s]
set -u
Q=${TPU_WORKER_QUEUE:-/tmp/tpuq}
NAME=$1
SRC=$2
TMO=${3:-900}
JOB="$Q/50_${NAME}.py"
DONE="$Q/50_${NAME}.done"
OUT="$Q/50_${NAME}.out"
# clear stale markers from an earlier timed-out job of the same name,
# or the next wait would return the OLD job's output as if it were new
rm -f "$DONE" "$OUT"
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
