#!/bin/bash
# Round-3 serial TPU chain (restartable): resume the arm-sweep smpl_nerf run
# (the tunnel dropped mid-run; full-fidelity resume picks up Adam moments +
# EMA at the last epoch), score it, then the Table-1 sequences, then the
# stage-3 extras. ONE TPU process at a time, always.
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}

ARM_RUN=$(ls -d runs/*smplnerf_armsweep_256 | tail -1)
DS=data/armsweep_256_aa

# epochs completed so far are recorded in train_state.npz; resume to 60 total
DONE=$(python - <<EOF
import numpy as np
print(int(np.load("$ARM_RUN/train_state.npz")["epoch"]) + 1)
EOF
)
LEFT=$((60 - DONE))
echo "resuming $ARM_RUN from epoch $DONE (+$LEFT epochs)"
if [ "$LEFT" -gt 0 ]; then
  python train.py --config=/dev/null --dataset_dir="$DS" \
    --model_type=smpl_nerf --human_pose_encoding=1 \
    --number_frequencies_pose=10 --batchsize=2048 --batchsize_val=4096 \
    --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1 \
    --sigma_noise_std=1 --white_background=1 --near=1.0 --far=4.0 \
    --skips=4 --skips_fine=4 --lrate=5e-4 --lrate_decay=500 \
    --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
    --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
    --number_validation_images=0 --render_gif=0 --param_ema=0.999 \
    --load_run="$ARM_RUN" --num_epochs=$LEFT \
    --experiment_name=smplnerf_armsweep_256
fi

# score the newest run dir that has a best snapshot
SCORE_RUN=$(ls -d runs/*smplnerf_armsweep_256 | tail -1)
python inference.py --inf_run_dir="$SCORE_RUN/best" \
    --inf_ground_truth_dir="$DS/val" --inf_save_dir="$SCORE_RUN/renders_val" \
    --inf_batchsize=4096

bash scripts/run_table1_sequences.sh
bash scripts/run_round3_extras.sh
