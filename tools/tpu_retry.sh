#!/bin/bash
# Run a TPU job with wedge protection: the axon relay occasionally hands out
# a dud session that blocks forever with ~0 CPU (NEXT_STEPS.md "Environment
# notes").  Watch the job's log for output silence; after $STALL_S seconds
# with no new bytes, kill the process group and retry (fresh connection
# works).  Total attempts: $TRIES.
#
# Usage: STALL_S=420 TRIES=3 tools/tpu_retry.sh <logfile> <cmd> [args...]
set -u
LOG="$1"; shift
STALL_S="${STALL_S:-420}"
TRIES="${TRIES:-3}"

for attempt in $(seq 1 "$TRIES"); do
  : > "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  PID=$!
  last_size=0
  last_change=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 15
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      last_change=$now
    elif [ $((now - last_change)) -ge "$STALL_S" ]; then
      echo "[tpu_retry] attempt $attempt stalled (${STALL_S}s log silence); killing" >> "$LOG"
      kill -- -"$PID" 2>/dev/null
      sleep 3
      kill -9 -- -"$PID" 2>/dev/null
      break
    fi
  done
  if wait "$PID" 2>/dev/null; then
    echo "[tpu_retry] attempt $attempt succeeded" >> "$LOG"
    exit 0
  fi
  echo "[tpu_retry] attempt $attempt failed/killed; $((TRIES - attempt)) retries left" >> "$LOG"
done
echo "[tpu_retry] all $TRIES attempts failed" >> "$LOG"
exit 1
