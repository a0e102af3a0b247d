#!/bin/bash
# Round-3 wrap-up TPU stages — run ONLY after run_round3_extras.sh exits
# (never two TPU processes at once; see CLAUDE.md).
#  a. full-render val scoring of the converged dummy_dynamic run (the
#     in-training 19.7 PSNR is a 131k-ray estimate; RESULTS.md wants the
#     inference.py full-render number like every other row)
#  b. one bench.py pass to confirm the occupancy render latency recovered
#     after moving the saturation guardrail host-side (143 -> ~57 ms)
set -e
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}

DYN_RUN=${DYN_RUN:-$(ls -dt runs/*dynamic_256* | head -1)}
echo "scoring dynamic run: $DYN_RUN"
python inference.py --inf_run_dir="$DYN_RUN" \
    --inf_ground_truth_dir=data/walking_256/val \
    --inf_save_dir="$DYN_RUN/renders_val" --inf_batchsize=16384

python bench.py
