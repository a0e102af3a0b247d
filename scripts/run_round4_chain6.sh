#!/bin/bash
# Round-4 TPU chain 6 (after chain 5): dummy_dynamic on the WALKING sequence
# with the swept warp hyperparameters (radius 0.3, temperature 100). The
# round-2 19.8-PSNR walking number was measured at the reference's default
# t=10000 (nearest-vertex snapping); the round-4 sweep showed the soft blend
# is worth +7 dB on armsweep — this run re-measures the walking ceiling.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round4 runs

log () { echo "[round4-chain6 $(date -u +%H:%M:%S)] $*"; }

busy () {
  ps -eo pid,args | grep -E \
    "train\.py|inference\.py|distill_run\.py|run_round4_chain[1-5]" \
    | grep -v grep | grep -v $$ >/dev/null
}
while busy; do sleep 60; done
log "no other TPU owner visible; chain 6 owns the TPU"

DS=data/walking_256_aa
[ -d "$DS/train" ] || { log "walking_256_aa not on disk"; exit 0; }
COMMON="--config=/dev/null --dataset_dir=$DS --batchsize=2048
  --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
  --far=4.0 --skips=4 --lrate=5e-4 --compute_dtype=bfloat16 --use_pallas=1
  --scan_steps=16 --foreground_sample_ratio=0.5 --val_rays=131072
  --number_validation_images=0 --render_gif=0 --param_ema=0.999
  --model_type=dummy_dynamic --number_coarse_samples=64 --run_fine=0
  --images_per_batch=8 --warp_radius=0.3 --warp_temperature=100"

stage_walking () {
  local NAME=dynsoft_walking_256
  local RUN RESUME DONE LEFT
  RUN=$(for d in $(ls -dt runs/*${NAME}* 2>/dev/null); do
          [ -f "$d/train_state.npz" ] && { echo "$d"; break; }; done)
  if [ -n "$RUN" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$RUN/train_state.npz')['epoch'])+1)")
    RESUME="--load_run=$RUN"
  else
    DONE=0; RESUME=""
  fi
  LEFT=$((20 - DONE))
  if [ "$LEFT" -gt 0 ]; then
    timeout 10800 python train.py $COMMON --steps_per_epoch=2000 \
        --num_epochs=$LEFT $RESUME --experiment_name=$NAME || return 1
  fi
  RUN=$(ls -dt runs/*${NAME} | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/scores.json" ]; then
    timeout 3600 python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384 | tee "$RUN/inference.log" || return 1
  fi
  mkdir -p artifacts/round4/$NAME
  for f in "$RUN/val_curve.json" "$RUN/renders_val/scores.json" "$RUN/inference.log"; do
    [ -f "$f" ] && cp "$f" "artifacts/round4/$NAME/$(basename "$f")"
  done
  git add artifacts/round4/$NAME >/dev/null 2>&1
  git commit -q -m "artifacts: round-4 $NAME measurements" \
      -- artifacts/round4/$NAME || true
  log "committed artifacts for $NAME"
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-8}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 && stage_walking; then
    log "=== chain 6 complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
