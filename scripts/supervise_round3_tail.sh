#!/bin/bash
# Supervise the round-3 TPU tail: wait for an already-running ablation-chain
# waiter (PID in /tmp/abl.pid, if alive) to exit, then drive the idempotent
# chains to completion with retries across tunnel outages:
#   scripts/run_table2_ablations.sh  (resumes interrupted stages)
#   scripts/run_round3_final.sh      (skips completed stages)
# Never runs concurrently with the watched PID — exactly one TPU process.
WATCH_PID=$(cat /tmp/abl.pid 2>/dev/null)
if [ -n "$WATCH_PID" ]; then
  while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 120; done
fi
for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-8}); do
  echo "=== supervisor attempt $ATTEMPT $(date -u +%H:%M:%S) ==="
  if bash scripts/wait_for_tpu.sh bash scripts/run_table2_ablations.sh \
     && bash scripts/wait_for_tpu.sh bash scripts/run_round3_final.sh; then
    echo "=== supervisor: all stages complete ==="
    exit 0
  fi
  echo "=== attempt $ATTEMPT failed (likely tunnel drop) — retrying ==="
  sleep 180
done
echo "=== supervisor: gave up after ${MAX_ATTEMPTS:-8} attempts ===" >&2
exit 1
