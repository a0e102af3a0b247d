#!/bin/bash
# Post-flagship reference-scale extras on the walking_256 dataset:
#   1. dummy_dynamic — in-step differentiable SMPL LBS + vertex-attention warp
#      at the paper's 256x256 scale, with --images_per_batch keeping the LBS
#      cost flat in the 230-image dataset.
#   2. bench.py — fresh headline numbers (incl. the occupancy-culled render).
# Run ONLY after scripts/run_reference_scale.sh finishes (single TPU process!).
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
DS=${1:-data/walking_256}

python train.py --config=/dev/null --dataset_dir="$DS" \
  --model_type=dummy_dynamic --batchsize=2048 --batchsize_val=4096 \
  --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=1 \
  --white_background=1 --near=1.0 --far=4.0 --skips=4 --lrate=5e-4 \
  --compute_dtype=bfloat16 --use_pallas=1 --foreground_sample_ratio=0.5 \
  --steps_per_epoch=2000 --val_rays=131072 --number_validation_images=0 \
  --render_gif=0 --warp_radius=0.15 --images_per_batch=8 \
  --num_epochs=${EPOCHS:-25} --experiment_name=dynamic_256

python bench.py
