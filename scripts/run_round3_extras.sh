#!/bin/bash
# Round-3 stage 3 (VERDICT items 3, 4, 5, 8): converge the dynamic family,
# run the image-wise analysis-by-synthesis experiment at 256^2, produce the
# pix2pix-standin baseline row, and commit the roofline/fused-MLP evidence.
# Run ONLY when no other TPU process is live.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}

# ---- 3a. dummy_dynamic to plateau: resume the round-2 run (epoch 19) with
#          full-fidelity optimizer state for +30 epochs -----------------------
# resume from the NEWEST dynamic run (so a rerun after an interruption
# continues from the interrupted resume, not from the round-2 checkpoint)
DYN_RUN=${DYN_RUN:-$(ls -d runs/*dynamic_256* | tail -1)}
DYN_DONE=$(python -c "import numpy as np; print(int(np.load('$DYN_RUN/train_state.npz')['epoch'])+1)")
DYN_TARGET=${DYN_TARGET:-50}
DYN_EPOCHS=$((DYN_TARGET - DYN_DONE))
if [ "$DYN_EPOCHS" -le 0 ]; then DYN_EPOCHS=0; fi
echo "dynamic: resuming $DYN_RUN from epoch $DYN_DONE (+$DYN_EPOCHS)"
if [ "$DYN_EPOCHS" -gt 0 ]; then
python train.py --config=/dev/null --dataset_dir=data/walking_256 \
  --model_type=dummy_dynamic --batchsize=2048 --batchsize_val=4096 \
  --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=1 \
  --white_background=1 --near=1.0 --far=4.0 --skips=4 --lrate=5e-4 \
  --compute_dtype=bfloat16 --use_pallas=1 --foreground_sample_ratio=0.5 \
  --steps_per_epoch=2000 --val_rays=131072 --number_validation_images=0 \
  --render_gif=0 --warp_radius=0.15 --images_per_batch=8 \
  --load_run="$DYN_RUN" --num_epochs=$DYN_EPOCHS \
  --experiment_name=dynamic_256_resume
fi

# ---- 3b. image_wise_dynamic at 256^2: frozen canonical NeRF + arm-angle
#          optimization against a 25-degree dataset ---------------------------
if [ ! -d data/canonical_256/train ]; then
  python create_dataset.py --save_dir=data/canonical_256 \
      --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
      --number_steps=40 --multi_human_pose=1 --human_number_steps=1 \
      --human_start_angle=0 --human_end_angle=0
fi
if [ ! -d data/arm25_256/train ]; then
  python create_dataset.py --save_dir=data/arm25_256 \
      --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
      --number_steps=40 --multi_human_pose=1 --human_number_steps=1 \
      --human_start_angle=25 --human_end_angle=25
fi

if ! ls -d runs/*canonical_nerf_256 2>/dev/null | grep -q .; then
  python train.py --config=/dev/null --dataset_dir=data/canonical_256 \
    --model_type=nerf --batchsize=2048 --batchsize_val=4096 \
    --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=1 \
    --white_background=1 --near=1.0 --far=4.0 --skips=4 --lrate=5e-4 \
    --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
    --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
    --number_validation_images=0 --render_gif=0 \
    --num_epochs=${CANON_EPOCHS:-30} --experiment_name=canonical_nerf_256
fi
CANON=$(ls -d runs/*canonical_nerf_256 | tail -1)

python train.py --config=/dev/null --dataset_dir=data/arm25_256 \
  --model_type=image_wise_dynamic --batchsize=2048 --batchsize_val=4096 \
  --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=0 \
  --white_background=1 --near=1.0 --far=4.0 --skips=4 \
  --compute_dtype=bfloat16 --use_pallas=1 \
  --number_validation_images=0 --render_gif=0 \
  --load_coarse_model="$CANON/best" --lrate_pose=3e-3 --warp_radius=0.15 \
  --num_epochs=${IW_EPOCHS:-40} --experiment_name=image_wise_256

IW=$(ls -d runs/*image_wise_256 | tail -1)
python tools/pose_landscape.py --run_dir "$IW" \
    --dataset_dir data/arm25_256/train --angles -10 60 36 --rays 8192 \
    --out "$IW/landscape.json"

# ---- 4. pix2pix-standin baseline row on the walking sequence ----------------
if [ ! -d data/walking_256_p2p/train ]; then
  python create_dataset.py --save_dir=data/walking_256_p2p \
      --dataset_type=pix2pix --resolution=256 --camera_path=circle \
      --number_steps=12 --multi_human_pose=1 \
      --smpl_sequence_file=data/walking_24.npz --sequence_skip=1 \
      --supersample=2
fi
python tools/pix2pix_baseline.py --dataset_dir data/walking_256_p2p \
    --epochs ${P2P_EPOCHS:-80} --out runs/baseline_p2p_walking

# ---- 6. round-2 footgun regression at production scale: occupancy-culled
#         render with NARROW (4096-ray row-band) batches + the AUTO budget
#         must match full-render quality (round 2 lost 1.3 dB here silently)
ARM_RUN=$(ls -d runs/*smplnerf_armsweep_256 | tail -1)
if [ -d "$ARM_RUN/best" ]; then
  python inference.py --inf_run_dir="$ARM_RUN/best" \
      --inf_ground_truth_dir=data/armsweep_256_aa/val \
      --inf_save_dir="$ARM_RUN/renders_val_occ" --inf_batchsize=4096 \
      --inf_fast=2
fi

# ---- 5 + 8. roofline / fused-MLP evidence on this chip ----------------------
python scripts/mlp_roofline.py --part all > RESULTS_roofline.jsonl \
    2> RESULTS_roofline.log || true
tail -20 RESULTS_roofline.log || true
