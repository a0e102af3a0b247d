#!/bin/bash
# Block until the axon-tunnelled TPU answers BOTH a cached matmul (execution
# path) and a FRESH never-before-seen compile (remote-compile path), then
# exec the given command (or exit 0 with no command). The tunnel can go fully
# down for hours, and — round-5 finding — it can also HALF-flap: cached
# programs execute fine while fresh remote compiles block forever in
# futex_do_wait. A probe that only exercises the cache green-lights a stage
# that then hangs on its first new program.
#
#   scripts/wait_for_tpu.sh [--max-wait SECONDS] [cmd args...]
MAX_WAIT=${MAX_WAIT:-0}   # 0 = forever
if [ "$1" = "--max-wait" ]; then MAX_WAIT=$2; shift 2; fi
START=$(date +%s)
while true; do
  K=$((137 + $(date +%s) % 797))   # unique inner dim -> never cache-hits
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('exec ok', float((x @ x).sum()))" >/dev/null 2>&1 \
     && timeout 300 python -c "
import jax, jax.numpy as jnp
a = jnp.ones((64, $K)); b = jnp.ones(($K, 64))
print('fresh compile ok', float((a @ b).sum()))" >/dev/null 2>&1; then
    echo "TPU reachable (exec + fresh compile) after $(( $(date +%s) - START ))s"
    break
  fi
  ELAPSED=$(( $(date +%s) - START ))
  if [ "$MAX_WAIT" -gt 0 ] && [ "$ELAPSED" -ge "$MAX_WAIT" ]; then
    echo "TPU still unreachable after ${ELAPSED}s — giving up" >&2
    exit 1
  fi
  echo "TPU unreachable or compile-hung (${ELAPSED}s) — retrying in 120s"
  sleep 120
done
[ $# -gt 0 ] && exec "$@"
exit 0
