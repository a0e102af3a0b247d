#!/bin/bash
# Round-4 TPU chain, VERDICT priority order:
#   A. regenerate walking_256_aa (runs/ + data/ are wiped between sessions)
#   B-D. finish paper Table 2 whole-budget: novdi, nope, bare (nofine + complete
#        already measured rounds 2/3: 36.90 / 39.26 — not rerun)
#   E. analysis-by-synthesis rerun with --lrate_pose_decay (VERDICT item 4)
#   F. pre-generate armsweep_256_aa for the chain-2 family runs
# Every stage is idempotent + resumable (train_state.npz); each training call
# is bounded by `timeout` so a hung tunnel process dies and the retry loop
# resumes it. Artifacts (scores.json / val_curve.json / pose_errors.json) are
# copied into artifacts/round4/ and committed THE MOMENT a stage finishes
# (CLAUDE.md artifact-persistence rule).
# Run ONLY one instance; it is the single TPU owner.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round4 runs data

log () { echo "[round4-chain $(date -u +%H:%M:%S)] $*"; }

commit_artifacts () {  # $1 = stage name, rest = files to persist
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

# ---- shared flagship recipe (identical to scripts/run_table2_ablations.sh) --
DS=data/walking_256_aa
T2COMMON="--config=/dev/null --dataset_dir=$DS --model_type=append_smpl_params
  --human_pose_encoding=1 --number_frequencies_pose=4 --batchsize=2048
  --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
  --far=4.0 --skips=4 --lrate=5e-4 --lrate_decay=500
  --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16
  --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072
  --number_validation_images=0 --render_gif=0 --param_ema=0.999"

# run_stage NAME TARGET TRAIN_TIMEOUT -- <train flags...>
# trains (resuming from the newest run with a train_state.npz), then renders
# the full 58-view val split and persists the artifacts.
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

stage_data_walking () {
  [ -d "$DS/train" ] && return 0
  [ -f data/walking_24.npz ] || timeout 1200 python tools/make_walking_sequence.py \
      --out data/walking_24.npz --frames 24 --cycles 1 || return 1
  timeout 2400 python create_dataset.py --save_dir="$DS" --dataset_type=smpl_nerf \
      --resolution=256 --camera_path=circle --number_steps=12 \
      --multi_human_pose=1 --smpl_sequence_file=data/walking_24.npz \
      --sequence_skip=1 --supersample=2
}

stage_novdi () {
  run_stage ablation_novdi 50 14400 -- $T2COMMON \
      --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
      --skips_fine=4 --use_directional_input=0
}

stage_nope () {
  run_stage ablation_nope 50 14400 -- $T2COMMON \
      --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
      --skips_fine=4 --number_frequencies_postitional=0 --use_identity_positional=1
}

stage_bare () {
  run_stage ablation_bare_walking 50 9000 -- $T2COMMON \
      --number_coarse_samples=64 --run_fine=0 --use_directional_input=0 \
      --number_frequencies_postitional=0 --use_identity_positional=1
}

stage_pose_decay () {
  # datasets (cheap: 40 single-pose views each)
  if [ ! -d data/canonical_256/train ]; then
    timeout 1800 python create_dataset.py --save_dir=data/canonical_256 \
        --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
        --number_steps=40 --multi_human_pose=1 --human_number_steps=1 \
        --human_start_angle=0 --human_end_angle=0 || return 1
  fi
  if [ ! -d data/arm25_256/train ]; then
    timeout 1800 python create_dataset.py --save_dir=data/arm25_256 \
        --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
        --number_steps=40 --multi_human_pose=1 --human_number_steps=1 \
        --human_start_angle=25 --human_end_angle=25 || return 1
  fi
  # canonical coarse NeRF (frozen renderer for the pose optimization)
  local CANON
  CANON=$(for d in $(ls -dt runs/*canonical_nerf_256 2>/dev/null); do
            [ -f "$d/train_state.npz" ] && { echo "$d"; break; }; done)
  local DONE=0 RESUME=""
  if [ -n "$CANON" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$CANON/train_state.npz')['epoch'])+1)")
    RESUME="--load_run=$CANON"
  fi
  if [ "$DONE" -lt 30 ]; then
    timeout 7200 python train.py --config=/dev/null --dataset_dir=data/canonical_256 \
      --model_type=nerf --batchsize=2048 --batchsize_val=4096 \
      --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=1 \
      --white_background=1 --near=1.0 --far=4.0 --skips=4 --lrate=5e-4 \
      --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
      --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
      --number_validation_images=0 --render_gif=0 $RESUME \
      --num_epochs=$((30 - DONE)) --experiment_name=canonical_nerf_256 || return 1
  fi
  CANON=$(ls -dt runs/*canonical_nerf_256 | head -1)
  # the decayed analysis-by-synthesis run (VERDICT item 4): decay_k=15 puts
  # the pose lr at 0.1x around the epoch-12 basin arrival, ~1e-3x by epoch 40
  local IW
  IW=$(ls -dt runs/*image_wise_256_decay 2>/dev/null | head -1)
  if [ -z "$IW" ] || [ ! -f "$IW/pose_errors.json" ]; then
    timeout 7200 python train.py --config=/dev/null --dataset_dir=data/arm25_256 \
      --model_type=image_wise_dynamic --batchsize=2048 --batchsize_val=4096 \
      --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=0 \
      --white_background=1 --near=1.0 --far=4.0 --skips=4 \
      --compute_dtype=bfloat16 --use_pallas=1 \
      --number_validation_images=0 --render_gif=0 \
      --load_coarse_model="$CANON/best" --lrate_pose=3e-3 \
      --lrate_pose_decay=15 --warp_radius=0.15 \
      --num_epochs=40 --experiment_name=image_wise_256_decay || return 1
  fi
  IW=$(ls -dt runs/*image_wise_256_decay | head -1)
  commit_artifacts image_wise_decay "$IW/pose_errors.json" "$CANON/val_curve.json"
}

stage_data_armsweep () {
  [ -d data/armsweep_256_aa/train ] && return 0
  timeout 2400 python create_dataset.py --save_dir=data/armsweep_256_aa \
      --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
      --number_steps=12 --multi_human_pose=1 --human_number_steps=24 \
      --human_start_angle=0 --human_end_angle=60 --supersample=2
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-20}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 7200 \
     && stage_data_walking \
     && stage_novdi \
     && stage_nope \
     && stage_bare \
     && stage_pose_decay \
     && stage_data_armsweep; then
    log "=== all round-4 chain-1 stages complete ==="
    exit 0
  fi
  log "=== attempt $ATTEMPT failed (likely tunnel drop) — retrying in 120s ==="
  sleep 120
done
log "gave up after ${MAX_ATTEMPTS:-20} attempts"
exit 1
