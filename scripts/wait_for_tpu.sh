#!/bin/bash
# Block until the axon-tunnelled TPU answers a trivial matmul, then exec the
# given command (or exit 0 with no command). The tunnel can go fully down for
# hours (round-3 log: 3+ h outage); launching a training run while it is down
# just wedges the process at startup with ~0 CPU (see CLAUDE.md playbook).
#
#   scripts/wait_for_tpu.sh [--max-wait SECONDS] [cmd args...]
MAX_WAIT=${MAX_WAIT:-0}   # 0 = forever
if [ "$1" = "--max-wait" ]; then MAX_WAIT=$2; shift 2; fi
START=$(date +%s)
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('tpu ok', float((x @ x).sum()))" >/dev/null 2>&1; then
    echo "TPU reachable after $(( $(date +%s) - START ))s"
    break
  fi
  ELAPSED=$(( $(date +%s) - START ))
  if [ "$MAX_WAIT" -gt 0 ] && [ "$ELAPSED" -ge "$MAX_WAIT" ]; then
    echo "TPU still unreachable after ${ELAPSED}s — giving up" >&2
    exit 1
  fi
  echo "TPU unreachable (${ELAPSED}s) — retrying in 120s"
  sleep 120
done
[ $# -gt 0 ] && exec "$@"
exit 0
