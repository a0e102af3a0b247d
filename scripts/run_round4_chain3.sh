#!/bin/bash
# Round-4 TPU chain 3 (runs AFTER scripts/run_round4_chain2.sh exits):
#   1. Expert-grid distillation of the trained canonical_nerf_256 run
#      (tools/distill_run.py): quality vs GT, distillation gap vs teacher,
#      and teacher-vs-distilled render latency on the real chip.
# Single TPU owner: waits for the chain-2 pid to exit first.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round4

log () { echo "[round4-chain3 $(date -u +%H:%M:%S)] $*"; }

C2PID=$(cat /tmp/round4_chain2.pid 2>/dev/null || echo "")
if [ -n "$C2PID" ]; then
  log "waiting for chain 2 (pid $C2PID) to exit"
  while kill -0 "$C2PID" 2>/dev/null; do sleep 60; done
fi
log "chain 2 exited; chain 3 owns the TPU"

TEACHER=$(for d in $(ls -dt runs/*canonical_nerf_256 2>/dev/null); do
            [ -d "$d/best" ] && { echo "$d"; break; }; done)
if [ -z "$TEACHER" ]; then
  log "no trained canonical_nerf_256 run on disk — nothing to distill"
  exit 0
fi
log "teacher: $TEACHER"

stage_distill () {  # $1 = tag, rest = distill_run flags
  local TAG=$1; shift
  local OUT=runs/distill_$TAG
  if [ ! -s "$OUT/scores.json" ]; then
    timeout 5400 python tools/distill_run.py --run_dir "$TEACHER/best" \
        --dataset_dir data/canonical_256/val --out_dir "$OUT" "$@" \
        2>&1 | tee "$OUT.log" || return 1
  fi
  mkdir -p artifacts/round4/distill
  cp "$OUT/scores.json" "artifacts/round4/distill/${TAG}_scores.json"
  [ -f "$OUT.log" ] && cp "$OUT.log" "artifacts/round4/distill/${TAG}.log"
  git add artifacts/round4/distill >/dev/null 2>&1
  git commit -q -m "artifacts: round-4 expert-distillation $TAG measurements" \
      -- artifacts/round4/distill || true
  log "committed distill $TAG"
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-8}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 \
     && stage_distill g16h32 --grid 16 --hidden 32 --steps 3000 \
                             --samples 192 --chunk 2048 --time_reps 5 \
                             --finetune_steps 2000 --finetune_batch 2048; then
    log "=== chain 3 complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
