#!/bin/bash
# Paper Table-2 ablations on the walking sequence (BASELINE.md), at the
# Table-1 flagship protocol (256^2 AA GT, AA+EMA recipe, 50-epoch budget).
# Restartable: each stage resumes from the newest matching run's
# train_state.npz (tunnel drops are routine — see CLAUDE.md).
# Run ONLY when no other TPU process is live.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}

DS=${DS:-data/walking_256_aa}
COMMON="--config=/dev/null --dataset_dir=$DS --model_type=append_smpl_params
  --human_pose_encoding=1 --number_frequencies_pose=4 --batchsize=2048
  --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
  --far=4.0 --skips=4 --lrate=5e-4 --lrate_decay=500
  --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16
  --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072
  --number_validation_images=0 --render_gif=0 --param_ema=0.999"

run_stage () {  # $1 = experiment name, rest = extra flags
  local NAME=$1; shift
  local TARGET=${TARGET_EPOCHS:-50}
  local RUN RESUME DONE LEFT
  # newest run dir that actually has a resumable checkpoint (an interrupted
  # resume can leave a newer dir with no train_state yet)
  RUN=$(for d in $(ls -dt runs/*${NAME}* 2>/dev/null); do
          [ -f "$d/train_state.npz" ] && { echo "$d"; break; }; done)
  if [ -n "$RUN" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$RUN/train_state.npz')['epoch'])+1)")
    RESUME="--load_run=$RUN"
  else
    DONE=0; RESUME=""
  fi
  LEFT=$((TARGET - DONE))
  echo "stage $NAME: $DONE epochs done, $LEFT to go"
  if [ "$LEFT" -gt 0 ]; then
    python train.py $COMMON "$@" $RESUME --num_epochs=$LEFT \
        --experiment_name="$NAME"
  fi
  RUN=$(ls -dt runs/*${NAME}* | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/img_000.png" ]; then
    python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384
  fi
}

# no fine sampling (coarse-only)
run_stage ablation_nofine_walking --number_coarse_samples=64 --run_fine=0

# no view-direction input
run_stage ablation_novdi --number_coarse_samples=64 --number_fine_samples=128 \
    --run_fine=1 --skips_fine=4 --use_directional_input=0

# no positional encoding (raw xyz positions; paper Table-2 row 2)
run_stage ablation_nope --number_coarse_samples=64 --number_fine_samples=128 \
    --run_fine=1 --skips_fine=4 --number_frequencies_postitional=0 \
    --use_identity_positional=1

# no PE + no VDI + no FS together (paper Table-2 row 1: 30.731).
# Distinct name (no substring overlap with the stages above — run_stage
# globs runs/*NAME*, so e.g. "ablation_nope_nofine" would shadow
# "ablation_nope"'s newest-run lookup).
run_stage ablation_bare_walking --number_coarse_samples=64 --run_fine=0 \
    --use_directional_input=0 --number_frequencies_postitional=0 \
    --use_identity_positional=1
