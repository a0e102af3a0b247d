#!/bin/bash
# Run the five BASELINE.json configs sequentially on the TPU.
# Usage: bash scripts/run_baseline_configs.sh [dataset_dir]
# Generates the shared 128x128 arm-angle dataset if missing.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
DS=${1:-data/arm_angles_128}

if [ ! -d "$DS/train" ]; then
  python create_dataset.py --save_dir="$DS" --dataset_type=smpl_nerf \
      --resolution=128 --camera_path=circle --number_steps=50 \
      --human_number_steps=50 --human_start_angle=-60 --human_end_angle=60
fi

COMMON="--config=/dev/null --dataset_dir=$DS --batchsize=2048 --batchsize_val=4096 \
  --number_coarse_samples=64 --number_fine_samples=128 --sigma_noise_std=1 \
  --white_background=1 --near=1.0 --far=4.0 --skips=4 --skips_fine=4 --lrate=5e-4 \
  --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
  --foreground_sample_ratio=0.5 --number_validation_images=2 --render_gif=0"

# config 1: nerf coarse-only
python train.py $COMMON --model_type=nerf --run_fine=0 --num_epochs=60 \
    --experiment_name=cfg1_nerf_coarse
# config 2: nerf + hierarchical fine sampling
python train.py $COMMON --model_type=nerf --run_fine=1 --num_epochs=60 \
    --experiment_name=cfg2_nerf_fine
# config 3: append_smpl_params
python train.py $COMMON --model_type=append_smpl_params --run_fine=0 \
    --human_pose_encoding=1 --number_frequencies_pose=4 --num_epochs=60 \
    --experiment_name=cfg3_append_smpl_params
# config 4: smpl_nerf (warp field), coarse+fine
python train.py $COMMON --model_type=smpl_nerf --run_fine=1 \
    --human_pose_encoding=1 --number_frequencies_pose=10 --num_epochs=60 \
    --experiment_name=cfg4_smpl_nerf
# config 5: image_wise_dynamic (pose optimization through frozen NeRF)
python train.py $COMMON --model_type=image_wise_dynamic --run_fine=0 \
    --num_epochs=10 --lrate_pose=0.05 --warp_radius=0.05 \
    --experiment_name=cfg5_image_wise
