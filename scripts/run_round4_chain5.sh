#!/bin/bash
# Round-4 TPU chain 5 (runs AFTER scripts/run_round4_chain4.sh exits):
# the CLEAN expert-distillation measurement — the chain-3 attempt ran three
# concurrent waiter instances (see CLAUDE.md supervisor-kill discipline) and
# its latency numbers were chip-contention garbage. Also fixes the recipe:
# 20k distill steps (3k left a 12 dB gap), grid 20, tighter AABB probe,
# photometric fine-tune.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round4

log () { echo "[round4-chain5 $(date -u +%H:%M:%S)] $*"; }

# Robust single-owner barrier: pidfiles have lied before (see CLAUDE.md
# supervisor-kill discipline) — wait until NO other TPU-owning process is
# visible in ps, pidfile or not. (Scan only; never kill by pattern.)
busy () {
  ps -eo pid,args | grep -E \
    "train\.py|inference\.py|distill_run\.py|run_round4_chain[1-4]" \
    | grep -v grep | grep -v $$ >/dev/null
}
while busy; do sleep 60; done
log "no other TPU owner visible; chain 5 owns the TPU"

TEACHER=$(for d in $(ls -dt runs/*canonical_nerf_256 2>/dev/null); do
            [ -d "$d/best" ] && { echo "$d"; break; }; done)
[ -z "$TEACHER" ] && { log "no canonical_nerf_256 teacher on disk"; exit 0; }

stage_distill () {
  local TAG=$1; shift
  local OUT=runs/distill_$TAG
  if [ ! -s "$OUT/scores.json" ]; then
    timeout 7200 python tools/distill_run.py --run_dir "$TEACHER/best" \
        --dataset_dir data/canonical_256/val --out_dir "$OUT" "$@" \
        2>&1 | tee "$OUT.log" || return 1
    [ -s "$OUT/scores.json" ] || return 1
  fi
  mkdir -p artifacts/round4/distill
  cp "$OUT/scores.json" "artifacts/round4/distill/${TAG}_scores.json"
  [ -f "$OUT.log" ] && cp "$OUT.log" "artifacts/round4/distill/${TAG}.log"
  git add artifacts/round4/distill >/dev/null 2>&1
  git commit -q -m "artifacts: round-4 expert-distillation $TAG (clean, single TPU owner)" \
      -- artifacts/round4/distill || true
  log "committed distill $TAG"
}

# two boundary probes for the warp sweep ridge (t=100 showed radius finally
# matters: r0.3 29.5 vs r0.15 27.4 — check wider and softer)
stage_sweep_edge () {
  local DS=data/armsweep_256_aa
  local COMMON="--config=/dev/null --dataset_dir=$DS --batchsize=2048
    --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
    --far=4.0 --skips=4 --lrate=5e-4 --compute_dtype=bfloat16 --use_pallas=1
    --scan_steps=16 --foreground_sample_ratio=0.5 --val_rays=131072
    --number_validation_images=0 --render_gif=0 --param_ema=0.999
    --model_type=dummy_dynamic --number_coarse_samples=64 --run_fine=0
    --images_per_batch=8"
  for RT in 0.5:100 0.3:30; do
    local R=${RT%%:*} T=${RT##*:}
    local NAME=dynsweep_r${R}_t${T}
    local RUN
    RUN=$(ls -dt runs/*${NAME} 2>/dev/null | head -1)
    if [ -n "$RUN" ] && [ -f "$RUN/val_curve.json" ] \
       && [ "$(python -c "import json;print(len(json.load(open('$RUN/val_curve.json'))))" 2>/dev/null)" -ge 6 ]; then
      continue
    fi
    timeout 3600 python train.py $COMMON --warp_radius=$R \
        --warp_temperature=$T --steps_per_epoch=1000 --num_epochs=6 \
        --experiment_name=$NAME || return 1
    RUN=$(ls -dt runs/*${NAME} | head -1)
    mkdir -p artifacts/round4/sweep
    cp "$RUN/val_curve.json" "artifacts/round4/sweep/${NAME}_val_curve.json"
    git add artifacts/round4/sweep >/dev/null 2>&1
    git commit -q -m "artifacts: round-4 sweep edge probe $NAME" \
        -- artifacts/round4/sweep || true
  done
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-8}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 \
     && stage_sweep_edge \
     && stage_distill g20 --grid 20 --hidden 32 --steps 20000 --batch 8192 \
            --samples 192 --chunk 2048 --time_reps 5 --probe_res 96 \
            --sigma_thresh 10 --finetune_steps 3000 --finetune_batch 4096 \
     && stage_distill g20_nobias --grid 20 --hidden 32 --steps 20000 \
            --batch 8192 --samples 192 --chunk 2048 --time_reps 3 \
            --probe_res 96 --sigma_thresh 10 --distill_bias 0 \
            --finetune_steps 0; then
    log "=== chain 5 complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
