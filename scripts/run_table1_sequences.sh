#!/bin/bash
# Round-3 item 2 (VERDICT): complete the paper's Table-1 matrix. The paper
# (BASELINE.md) reports three 256^2 motion sequences — waving / arms swinging /
# walking. Round 2 ran walking only; this generates the other two as
# AMASS-format synthetic cycles (tools/make_motion_sequence.py) with
# anti-aliased GT and trains the AA+EMA flagship on each at the identical
# 50-epoch budget the walking row used (39.26 PSNR, scripts/run_aa_flagship.sh).
# Run ONLY when no other TPU process is live.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
EPOCHS=${EPOCHS:-50}

for MOTION in waving arms_swinging; do
  DS=data/${MOTION}_256_aa
  if [ ! -d "$DS/train" ]; then
    python tools/make_motion_sequence.py --motion $MOTION --frames 24 \
        --cycles 1 --out data/${MOTION}_24.npz
    python create_dataset.py --save_dir="$DS" --dataset_type=smpl_nerf \
        --resolution=256 --camera_path=circle --number_steps=12 \
        --multi_human_pose=1 --smpl_sequence_file=data/${MOTION}_24.npz \
        --sequence_skip=1 --supersample=2
  fi

  # resume-capable: if a previous (interrupted) run of this motion exists,
  # continue it from its train_state.npz instead of restarting cold
  PREV=$(ls -d runs/*flagship_aa_${MOTION} 2>/dev/null | tail -1)
  RESUME=""
  LEFT=$EPOCHS
  if [ -n "$PREV" ] && [ -f "$PREV/train_state.npz" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$PREV/train_state.npz')['epoch'])+1)")
    LEFT=$((EPOCHS - DONE))
    if [ "$LEFT" -le 0 ]; then
      echo "$MOTION already trained to $DONE epochs — skipping train"
    else
      RESUME="--load_run=$PREV"
      echo "resuming $PREV from epoch $DONE (+$LEFT)"
    fi
  fi
  if [ "$LEFT" -gt 0 ]; then
  python train.py --config=/dev/null --dataset_dir="$DS" \
    --model_type=append_smpl_params --human_pose_encoding=1 \
    --number_frequencies_pose=4 --batchsize=2048 --batchsize_val=4096 \
    --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
    --sigma_noise_std=1 --white_background=1 --near=1.0 --far=4.0 \
    --skips=4 --skips_fine=4 --lrate=5e-4 --lrate_decay=500 \
    --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
    --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
    --number_validation_images=0 --render_gif=0 --param_ema=0.999 \
    --num_epochs=$LEFT $RESUME --experiment_name=flagship_aa_${MOTION}
  fi

  # score only the newest run (a resumed run carries the best checkpoint on)
  RUN=$(ls -d runs/*flagship_aa_${MOTION} | tail -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/img_000.png" ]; then
    python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=4096
  fi
done
