#!/bin/bash
# Round-4 TPU chain 6 (after chain 5):
#   1. one more warp-ridge probe (r0.7/t100 — r0.5/t100 hit 32.09 at probe
#      budget, still climbing with radius),
#   2. converge the best probe point on armsweep (20 epochs + full scoring),
#   3. dummy_dynamic on the WALKING sequence with that winner — the round-2
#      19.8-PSNR walking number was the reference-default sharp warp.
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

ADS=data/armsweep_256_aa
WDS=data/walking_256_aa
common_flags () {  # $1 = dataset dir
  echo "--config=/dev/null --dataset_dir=$1 --batchsize=2048
    --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
    --far=4.0 --skips=4 --lrate=5e-4 --compute_dtype=bfloat16 --use_pallas=1
    --scan_steps=16 --foreground_sample_ratio=0.5 --val_rays=131072
    --number_validation_images=0 --render_gif=0 --param_ema=0.999
    --model_type=dummy_dynamic --number_coarse_samples=64 --run_fine=0
    --images_per_batch=8"
}

commit_run () {  # $1 = stage name, $2 = run dir
  mkdir -p "artifacts/round4/$1"
  for f in "$2/val_curve.json" "$2/renders_val/scores.json" "$2/inference.log"; do
    [ -f "$f" ] && cp "$f" "artifacts/round4/$1/$(basename "$f")"
  done
  git add "artifacts/round4/$1" >/dev/null 2>&1
  git commit -q -m "artifacts: round-4 $1 measurements" -- "artifacts/round4/$1" || true
  log "committed artifacts for $1"
}

stage_probe_r07 () {
  local NAME=dynsweep_r0.7_t100
  local RUN
  RUN=$(ls -dt runs/*${NAME} 2>/dev/null | head -1)
  if [ -n "$RUN" ] && [ -f "$RUN/val_curve.json" ] \
     && [ "$(python -c "import json;print(len(json.load(open('$RUN/val_curve.json'))))" 2>/dev/null)" -ge 6 ]; then
    return 0
  fi
  timeout 3600 python train.py $(common_flags $ADS) --warp_radius=0.7 \
      --warp_temperature=100 --steps_per_epoch=1000 --num_epochs=6 \
      --experiment_name=$NAME || return 1
  RUN=$(ls -dt runs/*${NAME} | head -1)
  mkdir -p artifacts/round4/sweep
  cp "$RUN/val_curve.json" "artifacts/round4/sweep/${NAME}_val_curve.json"
  git add artifacts/round4/sweep >/dev/null 2>&1
  git commit -q -m "artifacts: round-4 sweep edge probe $NAME" \
      -- artifacts/round4/sweep || true
}

pick_best () {
  python - <<'EOF'
import glob, json, os
best, arg = -1, None
for d in glob.glob("runs/*dynsweep_r*"):
    try:
        vc = json.load(open(os.path.join(d, "val_curve.json")))
    except Exception:
        continue
    p = vc[-1]["psnr_estimate"]
    if p > best:
        best, arg = p, os.path.basename(d).split("dynsweep_")[1]
print(arg or "")
EOF
}

train_converged () {  # $1 = name, $2 = dataset, $3 = radius, $4 = temp
  local NAME=$1 DS=$2 R=$3 T=$4
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
    timeout 10800 python train.py $(common_flags $DS) --warp_radius=$R \
        --warp_temperature=$T --steps_per_epoch=2000 --num_epochs=$LEFT \
        $RESUME --experiment_name=$NAME || return 1
  fi
  RUN=$(ls -dt runs/*${NAME} | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/scores.json" ]; then
    timeout 3600 python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384 | tee "$RUN/inference.log" || return 1
  fi
  commit_run "$NAME" "$RUN"
}

stage_converge_and_walk () {
  local BEST R T
  BEST=$(pick_best)
  [ -z "$BEST" ] && return 1
  R=${BEST%%_t*}; R=${R#r}
  T=${BEST##*_t}
  log "ridge winner: radius=$R temperature=$T"
  if [ "$R" = "0.3" ] && [ "$T" = "100" ]; then
    log "winner already converged as dynbest_r0.3_t100 — skipping re-converge"
  else
    train_converged "dynbest2_r${R}_t${T}" $ADS $R $T || return 1
  fi
  [ -d "$WDS/train" ] || { log "walking_256_aa not on disk"; return 0; }
  train_converged "dynsoft_walking_256" $WDS $R $T
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-8}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 \
     && stage_probe_r07 \
     && stage_converge_and_walk; then
    log "=== chain 6 complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
