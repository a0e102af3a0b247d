#!/bin/bash
# Round-3 final TPU batch (runs AFTER scripts/run_table2_ablations.sh):
#   1. pix2pix-standin baseline rows for waving + arms_swinging — completes
#      the paper Table-1 ours-vs-pix2pix structure for ALL three sequences
#      (walking row exists: runs/baseline_p2p_walking, 37.05/0.9940).
#   2. image_wise_dynamic rerun with --lrate_pose_decay — pins the pose
#      estimate at the basin floor instead of the constant-lr orbit
#      (RESULTS.md: best 4.7e-5 rad^2 at ep12, 8e-4..0.03 bounce after).
# Idempotent: stages skip when their outputs already exist.
# Run ONLY when no other TPU process is live.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}

# ---- 1. pix2pix baselines for the two remaining Table-1 sequences ----------
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

# ---- 2. single-GT head-to-heads (reference evaluate_pix2pix.py workflow) ----
# Mirrors the walking row (runs/comparison_walking.gif): score Ours and the
# pix2pix stand-in against the SAME <motion>_256_aa val PNGs + 3-way GIF.
# CPU-forced: pure PNG scoring, keeps the TPU free and tunnel-outage-proof.
for MOTION in waving arms_swinging; do
  OURS=$(ls -d runs/*flagship_aa_${MOTION} 2>/dev/null | tail -1)
  if [ -n "$OURS" ] && [ -f "runs/baseline_p2p_${MOTION}/scores.json" ] \
     && [ ! -f "runs/comparison_${MOTION}.gif" ]; then
    JAX_PLATFORMS=cpu python evaluate_pix2pix.py \
      --gt_dir "data/${MOTION}_256_aa/val" \
      --nerf_dir "$OURS/renders_val" \
      --pix2pix_dir "runs/baseline_p2p_${MOTION}" \
      --out "runs/comparison_${MOTION}.gif" \
      | tee "runs/baseline_p2p_${MOTION}/head_to_head.log"
  fi
done

# ---- 3. analysis-by-synthesis with pose-lr decay ----------------------------
# ~1280 steps/epoch (40 imgs x 65536/2048 rays); decay_k=15 puts the pose lr
# at 0.1x around the epoch-12 basin arrival and ~1e-3x by epoch 40.
CANON=$(ls -d runs/*canonical_nerf_256 | tail -1)
IW_OUT=$(ls -d runs/*image_wise_256_decay 2>/dev/null | tail -1)
if [ -z "$IW_OUT" ] || [ ! -f "$IW_OUT/pose_errors.json" ]; then
  python train.py --config=/dev/null --dataset_dir=data/arm25_256 \
    --model_type=image_wise_dynamic --batchsize=2048 --batchsize_val=4096 \
    --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=0 \
    --white_background=1 --near=1.0 --far=4.0 --skips=4 \
    --compute_dtype=bfloat16 --use_pallas=1 \
    --number_validation_images=0 --render_gif=0 \
    --load_coarse_model="$CANON/best" --lrate_pose=3e-3 \
    --lrate_pose_decay=15 --warp_radius=0.15 \
    --num_epochs=${IW_EPOCHS:-40} --experiment_name=image_wise_256_decay
fi
