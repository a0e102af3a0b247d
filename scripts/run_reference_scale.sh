#!/bin/bash
# Reference-scale experiment (paper setup: ~225 train images, 256x256, a
# walking motion sequence, 12 viewpoints — BASELINE.md Table 1 rows).
# Usage: bash scripts/run_reference_scale.sh [dataset_dir]
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
DS=${1:-data/walking_256}

if [ ! -d "$DS/train" ]; then
  mkdir -p data
  # synthetic AMASS-format walking cycle (real AMASS data is licensed)
  python tools/make_walking_sequence.py --out data/walking_24.npz --frames 24 --cycles 1
  # 12 circle viewpoints x 24 walking frames = 288 images (230 train / 58 val)
  python create_dataset.py --save_dir="$DS" --dataset_type=smpl_nerf \
      --resolution=256 --camera_path=circle --number_steps=12 \
      --multi_human_pose=1 --smpl_sequence_file=data/walking_24.npz \
      --sequence_skip=1
fi

COMMON="--config=/dev/null --dataset_dir=$DS --batchsize=2048 --batchsize_val=4096 \
  --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
  --sigma_noise_std=1 --white_background=1 --near=1.0 --far=4.0 \
  --skips=4 --skips_fine=4 --lrate=5e-4 --lrate_decay=500 \
  --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
  --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
  --number_validation_images=0 --render_gif=0"

# flagship: full-pose conditioning, hierarchical fine sampling
python train.py $COMMON --model_type=append_smpl_params \
    --human_pose_encoding=1 --number_frequencies_pose=4 --num_epochs=150 \
    --experiment_name=flagship_append_256

# warp-field variant
python train.py $COMMON --model_type=smpl_nerf \
    --human_pose_encoding=1 --number_frequencies_pose=10 --num_epochs=60 \
    --experiment_name=flagship_smplnerf_256

# full-val-set scoring from the best-val checkpoints
for RUN in runs/*flagship_append_256 runs/*flagship_smplnerf_256; do
  [ -d "$RUN/best" ] && python inference.py --inf_run_dir="$RUN/best" \
      --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val"
done
