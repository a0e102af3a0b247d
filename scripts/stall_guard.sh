#!/bin/bash
# stall_guard.sh <stall_secs> <cmd...>
#
# Runs <cmd> with stdout+stderr tee'd to the console; if the command's
# combined output produces NO new bytes for <stall_secs>, the child process
# GROUP is killed (numeric pids only — never pattern-kill) and the guard
# exits 124, so a supervising retry loop treats it like a timeout.
#
# Why: the axon TPU tunnel can hang a run indefinitely (~0% CPU, no output,
# blocked in futex_do_wait on a remote compile that never returns);
# round-4/5 lost 45+ minute slices waiting on the stage `timeout` to fire.
# PYTHONUNBUFFERED: the child's stdout goes to a pipe, and python would
# block-buffer it — heartbeat prints must hit the log immediately or a
# HEALTHY long fit looks hung.
set -u
STALL=$1; shift
LOG=$(mktemp /tmp/stall_guard.XXXXXX.log)
PYTHONUNBUFFERED=1 setsid "$@" >"$LOG" 2>&1 &
PID=$!
tail -f "$LOG" &
TAIL=$!
LAST_SIZE=-1
LAST_CHANGE=$(date +%s)
STATUS=0
while true; do
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID"; STATUS=$?
    break
  fi
  SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  NOW=$(date +%s)
  if [ "$SIZE" != "$LAST_SIZE" ]; then
    LAST_SIZE=$SIZE
    LAST_CHANGE=$NOW
  elif [ $((NOW - LAST_CHANGE)) -ge "$STALL" ]; then
    echo "[stall_guard] no output for ${STALL}s — killing pgid $PID" >&2
    kill -TERM -- "-$PID" 2>/dev/null
    sleep 10
    kill -KILL -- "-$PID" 2>/dev/null
    STATUS=124
    break
  fi
  sleep 20
done
sleep 1   # let tail flush the final lines
kill "$TAIL" 2>/dev/null
rm -f "$LOG"
exit $STATUS
