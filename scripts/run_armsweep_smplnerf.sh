#!/bin/bash
# Round-3 item 1 (VERDICT): prove the warp-field smpl_nerf family at its OWN
# reference protocol. The reference's quickstart and all its smpl_nerf
# experiments use arm-angle-sweep scenes (/root/reference/README.md:10-23,
# joints [41,38] = the two dims SmplNerfPipeline conditions on,
# /root/reference/models/smpl_nerf_pipeline.py:28). Round 2 only ran smpl_nerf
# on a full-body walking sequence, which 2-joint conditioning cannot explain
# by construction. This runs the paper-scale (256^2, 288-image) arm-sweep with
# the AA+EMA recipe that lifted the flagship past the paper.
# Run ONLY when no other TPU process is live.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
DS=${1:-data/armsweep_256_aa}
EPOCHS=${EPOCHS:-60}

if [ ! -d "$DS/train" ]; then
  # 12 circle viewpoints x 24 arm angles in [0, 60] deg = 288 images
  # (230 train / 58 val), anti-aliased GT (--supersample=2).
  python create_dataset.py --save_dir="$DS" --dataset_type=smpl_nerf \
      --resolution=256 --camera_path=circle --number_steps=12 \
      --multi_human_pose=1 --human_number_steps=24 \
      --human_start_angle=0 --human_end_angle=60 --supersample=2
fi

python train.py --config=/dev/null --dataset_dir="$DS" \
  --model_type=smpl_nerf --human_pose_encoding=1 \
  --number_frequencies_pose=10 --batchsize=2048 --batchsize_val=4096 \
  --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
  --sigma_noise_std=1 --white_background=1 --near=1.0 --far=4.0 \
  --skips=4 --skips_fine=4 --lrate=5e-4 --lrate_decay=500 \
  --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
  --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
  --number_validation_images=0 --render_gif=0 --param_ema=0.999 \
  --num_epochs=$EPOCHS --experiment_name=smplnerf_armsweep_256

for RUN in runs/*smplnerf_armsweep_256; do
  [ -d "$RUN/best" ] && python inference.py --inf_run_dir="$RUN/best" \
      --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
      --inf_batchsize=4096
done
