#!/bin/bash
# Round-4 TPU chain 2 (runs AFTER scripts/run_round4_chain.sh):
#   1. fused_mlp_v2 re-measure, phase A          (VERDICT item 8, ~10 min)
#   2. vertex_sphere converged at armsweep 256^2 (VERDICT item 6; uses the
#      new --vertex_sphere_in_step path — the precomputed arrays are ~27 GB
#      at this scale)
#   3. append_vertex_locations_to_nerf converged at armsweep 256^2 (item 6)
#   4. dummy_dynamic radius x temperature sweep  (VERDICT item 5; short-budget
#      relative probe, 3x3, commits each point as it lands)
#   5. fused_mlp_v2 re-measure, phase B          (second chip-QoS phase)
# Idempotent + resumable; every score commits the moment it exists.
# Run ONLY one instance, and ONLY after chain 1 exits (single TPU owner).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round4 runs data

log () { echo "[round4-chain2 $(date -u +%H:%M:%S)] $*"; }

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

DS=data/armsweep_256_aa
COMMON="--config=/dev/null --dataset_dir=$DS --batchsize=2048
  --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
  --far=4.0 --skips=4 --lrate=5e-4 --compute_dtype=bfloat16 --use_pallas=1
  --scan_steps=16 --foreground_sample_ratio=0.5 --steps_per_epoch=2000
  --val_rays=131072 --number_validation_images=0 --render_gif=0
  --param_ema=0.999"

# run_stage NAME TARGET TRAIN_TIMEOUT -- <train flags>  (same as chain 1)
run_stage () {
  local NAME=$1 TARGET=$2 TMO=$3; shift 3
  [ "$1" = "--" ] && shift
  local RUN RESUME DONE LEFT
  RUN=$(for d in $(ls -dt runs/*${NAME}* 2>/dev/null); do
          [ -f "$d/train_state.npz" ] && { echo "$d"; break; }; done)
  if [ -n "$RUN" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$RUN/train_state.npz')['epoch'])+1)")
    RESUME="--load_run=$RUN"
  else
    DONE=0; RESUME=""
  fi
  LEFT=$((TARGET - DONE))
  log "stage $NAME: $DONE/$TARGET epochs done"
  if [ "$LEFT" -gt 0 ]; then
    timeout "$TMO" python train.py "$@" $RESUME --num_epochs=$LEFT \
        --experiment_name="$NAME" || return 1
  fi
  RUN=$(ls -dt runs/*${NAME}* | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/scores.json" ]; then
    timeout 3600 python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384 | tee "$RUN/inference.log" || return 1
  fi
  commit_artifacts "$NAME" "$RUN/val_curve.json" "$RUN/renders_val/scores.json" \
      "$RUN/inference.log"
}

# end-to-end flagship A/B for VERDICT item 8: same session, same chip phase,
# 3 epochs each (epoch 0 = compile; epochs 1-2 give the steady rate). The
# val_curve.json rays_per_sec column is the measurement.
stage_fusedv2_e2e () {
  local WDS=data/walking_256_aa
  [ -d "$WDS/train" ] || return 0   # chain-1 generates it; skip if absent
  local WCOMMON="--config=/dev/null --dataset_dir=$WDS
    --model_type=append_smpl_params --human_pose_encoding=1
    --number_frequencies_pose=4 --batchsize=2048 --batchsize_val=4096
    --sigma_noise_std=1 --white_background=1 --near=1.0 --far=4.0 --skips=4
    --lrate=5e-4 --lrate_decay=500 --compute_dtype=bfloat16 --scan_steps=16
    --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072
    --number_validation_images=0 --render_gif=0 --param_ema=0.999
    --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1
    --skips_fine=4 --num_epochs=3"
  for MODE in 0 2; do
    local NAME=fusedv2_ab_mlp${MODE}
    local RUN
    RUN=$(ls -dt runs/*${NAME} 2>/dev/null | head -1)
    if [ -z "$RUN" ] || [ ! -f "$RUN/val_curve.json" ]; then
      timeout 3600 python train.py $WCOMMON --use_pallas=1 \
          --use_fused_mlp=$MODE --experiment_name=$NAME || return 1
      RUN=$(ls -dt runs/*${NAME} | head -1)
    fi
    commit_artifacts fusedv2_e2e "$RUN/val_curve.json"
  done
}

# real on-chip bench with the round-4 occupancy-precondition fix (VERDICT
# weak #4): must show occupancy <= fg-culled with no precondition warning.
stage_bench () {
  local OUT=artifacts/round4/bench_main.json
  [ -s "$OUT" ] && return 0
  timeout 5400 python bench.py > "$OUT" 2> artifacts/round4/bench_main.log \
      || { rm -f "$OUT"; return 1; }
  git add artifacts/round4/bench_main.json artifacts/round4/bench_main.log
  git commit -q -m "artifacts: round-4 on-chip bench (occupancy measured inside its precondition)" || true
  log "committed artifacts for bench"
}

stage_roofline () {  # $1 = phase tag
  local OUT=artifacts/round4/roofline_fusedmlp_$1.jsonl
  [ -s "$OUT" ] && return 0
  timeout 2400 python scripts/mlp_roofline.py --part fusedmlp \
      --rows 131072 --reps 5 > "$OUT" || return 1
  git add "$OUT" && git commit -q -m "artifacts: round-4 fused-MLP roofline phase $1" -- "$OUT" || true
}

stage_vertex_sphere () {
  run_stage vertex_sphere_armsweep_256 ${VS_EPOCHS:-20} 10800 -- $COMMON \
      --model_type=vertex_sphere --number_coarse_samples=64 --run_fine=0 \
      --vertex_sphere_radius=0.05
}

stage_append_vertices () {
  run_stage appendverts_armsweep_256 ${AV_EPOCHS:-22} 12600 -- $COMMON \
      --model_type=append_vertex_locations_to_nerf \
      --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
      --skips_fine=4 --lrate_decay=500 --images_per_batch=8
}

# short-budget relative sweep: same protocol shape as the round-3
# dummy_dynamic armsweep run (coarse-only), quarter budget per point
stage_sweep () {
  local SWEEP_STEPS=${SWEEP_STEPS:-1000} SWEEP_EPOCHS=${SWEEP_EPOCHS:-6}
  for RT in 0.15:10000 0.05:10000 0.3:10000 0.15:1000 0.15:100000 \
            0.05:1000 0.05:100000 0.3:1000 0.3:100000; do
    local R=${RT%%:*} T=${RT##*:}
    local NAME=dynsweep_r${R}_t${T}
    local RUN
    RUN=$(ls -dt runs/*${NAME} 2>/dev/null | head -1)
    if [ -n "$RUN" ] && [ -f "$RUN/val_curve.json" ] \
       && [ "$(python -c "import json;print(len(json.load(open('$RUN/val_curve.json'))))" 2>/dev/null)" -ge "$SWEEP_EPOCHS" ]; then
      continue
    fi
    timeout 3600 python train.py $COMMON --model_type=dummy_dynamic \
        --number_coarse_samples=64 --run_fine=0 --images_per_batch=8 \
        --warp_radius=$R --warp_temperature=$T \
        --steps_per_epoch=$SWEEP_STEPS --num_epochs=$SWEEP_EPOCHS \
        --experiment_name=$NAME || return 1
    RUN=$(ls -dt runs/*${NAME} | head -1)
    commit_artifacts sweep "$RUN/val_curve.json"
  done
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-12}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 \
     && stage_bench \
     && stage_roofline a \
     && stage_vertex_sphere \
     && stage_append_vertices \
     && stage_sweep \
     && stage_fusedv2_e2e \
     && stage_roofline b; then
    log "=== all round-4 chain-2 stages complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up after ${MAX_ATTEMPTS:-12} attempts"
exit 1
