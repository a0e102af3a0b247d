#!/bin/bash
# Round-4 TPU chain 4 (runs AFTER scripts/run_round4_chain3.sh exits):
#   1. Extend the dummy_dynamic warp sweep to softer attention (t=100) —
#      the scripted 3x3 showed temperature monotone: 100000 < 10000 << 1000.
#   2. Converged 20-epoch run at the best (radius, temperature) of ALL sweep
#      points, full 58-view inference scoring — replaces the single-point
#      22.99 "structural ceiling" claim with the measured optimum.
# Single TPU owner: waits for the chain-3 pid to exit first.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round4 runs

log () { echo "[round4-chain4 $(date -u +%H:%M:%S)] $*"; }

C3PID=$(cat /tmp/round4_chain3.pid 2>/dev/null || echo "")
if [ -n "$C3PID" ]; then
  log "waiting for chain 3 (pid $C3PID) to exit"
  while kill -0 "$C3PID" 2>/dev/null; do sleep 60; done
fi
log "chain 3 exited; chain 4 owns the TPU"

DS=data/armsweep_256_aa
COMMON="--config=/dev/null --dataset_dir=$DS --batchsize=2048
  --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
  --far=4.0 --skips=4 --lrate=5e-4 --compute_dtype=bfloat16 --use_pallas=1
  --scan_steps=16 --foreground_sample_ratio=0.5 --val_rays=131072
  --number_validation_images=0 --render_gif=0 --param_ema=0.999
  --model_type=dummy_dynamic --number_coarse_samples=64 --run_fine=0
  --images_per_batch=8"

commit_artifacts () {
  local STAGE=$1; shift
  local DEST=artifacts/round4/$STAGE
  mkdir -p "$DEST"
  local GOT=0
  for f in "$@"; do
    [ -f "$f" ] && cp "$f" "$DEST/$(basename "$(dirname "$f")")_$(basename "$f")" && GOT=1
  done
  if [ "$GOT" = 1 ]; then
    git add artifacts/round4 >/dev/null 2>&1
    git commit -q -m "artifacts: round-4 $STAGE measurements" \
        -- artifacts/round4 >/dev/null 2>&1 || true
    log "committed artifacts for $STAGE"
  fi
}

stage_sweep_soft () {
  for RT in 0.15:100 0.3:100 0.3:300; do
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
    commit_artifacts sweep "$RUN/val_curve.json"
  done
}

stage_best_converged () {
  local BEST
  BEST=$(python - <<'EOF'
import glob, json, os
best, arg = -1, None
for d in glob.glob("runs/*dynsweep_r*"):
    try:
        vc = json.load(open(os.path.join(d, "val_curve.json")))
    except Exception:
        continue
    p = vc[-1]["psnr_estimate"]
    if p > best:
        tag = os.path.basename(d).split("dynsweep_")[1]   # r0.15_t1000
        best, arg = p, tag
print(arg or "")
EOF
)
  [ -z "$BEST" ] && { log "no sweep runs found"; return 1; }
  local R=${BEST%%_t*}; R=${R#r}
  local T=${BEST##*_t}
  log "best sweep point: radius=$R temperature=$T — converging 20 epochs"
  local NAME=dynbest_r${R}_t${T}
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
    timeout 10800 python train.py $COMMON --warp_radius=$R \
        --warp_temperature=$T --steps_per_epoch=2000 --num_epochs=$LEFT \
        $RESUME --experiment_name=$NAME || return 1
  fi
  RUN=$(ls -dt runs/*${NAME} | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/scores.json" ]; then
    timeout 3600 python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384 | tee "$RUN/inference.log" || return 1
  fi
  commit_artifacts "$NAME" "$RUN/val_curve.json" \
      "$RUN/renders_val/scores.json" "$RUN/inference.log"
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-8}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 \
     && stage_sweep_soft \
     && stage_best_converged; then
    log "=== chain 4 complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
