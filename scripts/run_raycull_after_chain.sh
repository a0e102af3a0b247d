#!/bin/bash
# Round-5 bonus stage: ray-level culling head-to-head for the distilled
# serving stack (tools/distill_run.py --ray_cull=1). Runs ONLY after the
# round-5 main chain has exited (single-TPU-owner discipline): waits on the
# supervisor PID, then probes the tunnel, then re-measures. All heavy
# artifacts (field.npz, field_ft2.npz, teacher_render.npz, score caches) are
# resumed from runs/distill_r5_static, so this pays for renders + timings
# only (~15 min on a healthy tunnel).
#
# Usage: nohup bash scripts/run_raycull_after_chain.sh <chain_pid> &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
CHAIN_PID=${1:?usage: run_raycull_after_chain.sh <chain_pid>}

log () { echo "[raycull $(date -u +%H:%M:%S)] $*"; }

log "waiting for chain pid $CHAIN_PID to exit"
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 120; done
log "chain exited — starting ray-cull re-measure"

TRUN=$(ls -dt runs/*canonical_nerf_256 2>/dev/null | head -1)
if [ -z "$TRUN" ] || [ ! -d "$TRUN/best" ]; then
  log "no canonical teacher run on disk — nothing to measure"; exit 1
fi
OUT=runs/distill_r5_static
if [ ! -f "$OUT/field_ft2.npz" ]; then
  log "no cached fine-tuned field at $OUT — refusing to retrain unattended"
  exit 1
fi

for ATTEMPT in 1 2 3 4 5; do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 14400 \
     && bash scripts/stall_guard.sh 1200 timeout 7200 \
        python tools/distill_run.py --run_dir="$TRUN/best" \
          --dataset_dir=data/canonical_256/val --out_dir="$OUT" \
          --grid=20 --hidden=32 --steps=20000 --batch=8192 --samples=192 \
          --chunk=4096 --tile=256 --finetune_steps=20000 \
          --finetune_batch=4096 --finetune_samples=96 --finetune_lr=3e-4 \
          --finetune2_steps=20000 --finetune2_lr=1e-4 \
          --ess=1 --also_bucketed=0 --time_tiles= --ray_cull=1 \
          > "$OUT.raycull.log" 2>&1; then
    if [ -f "$OUT/scores.json" ]; then
      DEST=artifacts/round5/distill_raycull
      mkdir -p "$DEST"
      cp "$OUT/scores.json" "$DEST/scores.json"
      cp "$OUT.raycull.log" "$DEST/raycull.log"
      git add artifacts/round5 >/dev/null 2>&1
      git commit -q -m "artifacts: round-5 ray-culled serving head-to-head" \
          -- artifacts/round5 || true
      log "=== ray-cull measurement landed ==="
      exit 0
    fi
  fi
  tail -3 "$OUT.raycull.log" 2>/dev/null
  log "attempt $ATTEMPT failed — retrying in 120s"
  sleep 120
done
log "gave up"
exit 1
