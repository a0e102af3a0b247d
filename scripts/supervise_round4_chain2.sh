#!/bin/bash
# Waits for round-4 chain 1 (pid in /tmp/round4_chain.pid) to exit, then
# launches chain 2 as the single TPU owner. NEVER run two instances.
set -u
cd "$(dirname "$0")/.."
C1PID=$(cat /tmp/round4_chain.pid 2>/dev/null || echo "")
if [ -n "$C1PID" ]; then
  while kill -0 "$C1PID" 2>/dev/null; do sleep 60; done
fi
echo "[supervisor $(date -u +%H:%M:%S)] chain 1 exited; starting chain 2"
bash scripts/run_round4_chain2.sh > /tmp/round4_chain2.log 2>&1 &
echo $! > /tmp/round4_chain2.pid
wait
