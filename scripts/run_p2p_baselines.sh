#!/bin/bash
# Pix2pix-standin baseline rows for waving + arms_swinging — completes the
# paper Table-1 ours-vs-pix2pix structure for ALL three sequences (the
# walking row exists: runs/baseline_p2p_walking, 37.05/0.9940).
# Idempotent: stages skip when their outputs already exist.
# Run ONLY when no other TPU process is live.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}

for MOTION in waving arms_swinging; do
  DS=data/${MOTION}_256_p2p
  if [ ! -d "$DS/train" ]; then
    # same recipe as the walking row (run_round3_extras.sh): the U-Net sees
    # GROUND-TRUTH depth of every val view, like the paper's Pix2Pix
    python create_dataset.py --save_dir="$DS" --dataset_type=pix2pix \
        --resolution=256 --camera_path=circle --number_steps=12 \
        --multi_human_pose=1 --smpl_sequence_file=data/${MOTION}_24.npz \
        --sequence_skip=1 --supersample=2
  fi
  if [ ! -f "runs/baseline_p2p_${MOTION}/scores.json" ]; then
    python tools/pix2pix_baseline.py --dataset_dir "$DS" \
        --epochs ${P2P_EPOCHS:-80} --out runs/baseline_p2p_${MOTION}
  fi
done
