#!/bin/bash
# Round-5 TPU chain 2 (after chain 1 completes — VERDICT items 2, 3, 5, 6, 8):
#   A. distill the canonical teacher through the round-5 TILED serving path,
#      20k distill + 20k fine-tune steps (targets: ESS latency < teacher,
#      quality gap <= 1 dB)
#   B. bench.py second chip phase (render-latency headline range)
#   C. append_smpl_params teacher on armsweep (20 ep) -> pose-baked distill
#      (per-pose serving of a flagship family)
#   D. GridNerf evidence: canonical nerf (30 ep, vs the MLP teacher) and
#      walking append flagship protocol (50 ep, vs the 39.26 MLP run)
# SINGLE TPU OWNER: blocks on a pure ps-scan until chain 1 is gone (no TPU
# probe while another owner may be live).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round5 runs data

log () { echo "[round5-chain2 $(date -u +%H:%M:%S)] $*"; }

busy () {
  ps -eo pid,args | grep -E \
    "run_round5_chain1|train\.py|inference\.py|create_dataset\.py|distill_run\.py|make_walking_sequence" \
    | grep -v grep | grep -v $$ >/dev/null
}
while busy; do sleep 60; done
log "no other TPU owner visible; chain 2 owns the TPU"

commit_artifacts () {  # $1 = stage name, rest = files to persist
  local STAGE=$1; shift
  local DEST=artifacts/round5/$STAGE
  mkdir -p "$DEST"
  local GOT=0
  for f in "$@"; do
    [ -f "$f" ] && cp "$f" "$DEST/$(basename "$f")" && GOT=1
  done
  if [ "$GOT" = 1 ]; then
    git add artifacts/round5 >/dev/null 2>&1
    git commit -q -m "artifacts: round-5 $STAGE measurements" \
        -- artifacts/round5 >/dev/null 2>&1 || true
    log "committed artifacts for $STAGE"
  fi
}

stage_distill_static () {
  [ -f artifacts/round5/distill_static/scores.json ] && return 0
  local TRUN
  TRUN=$(ls -dt runs/*canonical_nerf_256 2>/dev/null | head -1)
  [ -z "$TRUN" ] || [ ! -d "$TRUN/best" ] && { log "no canonical teacher"; return 1; }
  local OUT=runs/distill_r5_static
  if [ ! -f "$OUT/scores.json" ]; then
    bash scripts/stall_guard.sh 1200 timeout 14400 python tools/distill_run.py --run_dir="$TRUN/best" \
        --dataset_dir=data/canonical_256/val --out_dir="$OUT" \
        --grid=20 --hidden=32 --steps=20000 --batch=8192 --samples=192 \
        --chunk=4096 --tile=256 --finetune_steps=20000 --finetune_batch=4096 \
        --finetune_samples=96 --finetune_lr=3e-4 --ess=1 \
        2>&1 | tee "$OUT.log" || return 1
    [ -f "$OUT/scores.json" ] || return 1
  fi
  cp "$OUT.log" "$OUT/distill.log" 2>/dev/null
  commit_artifacts distill_static "$OUT/scores.json" "$OUT/distill.log"
}

stage_bench_phase () {
  [ -f artifacts/round5/bench_phase/bench_phase_a.json ] && return 0
  mkdir -p artifacts/round5/bench_phase
  bash scripts/stall_guard.sh 1200 timeout 5400 python bench.py > artifacts/round5/bench_phase/bench_phase_a.json \
      2> artifacts/round5/bench_phase/bench_phase_a.log || return 1
  commit_artifacts bench_phase artifacts/round5/bench_phase/bench_phase_a.json \
      artifacts/round5/bench_phase/bench_phase_a.log
}

APPEND_COMMON="--config=/dev/null --model_type=append_smpl_params
  --human_pose_encoding=1 --number_frequencies_pose=4 --batchsize=2048
  --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
  --far=4.0 --skips=4 --lrate=5e-4 --lrate_decay=500
  --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16
  --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072
  --number_validation_images=0 --render_gif=0 --param_ema=0.999
  --number_coarse_samples=64 --number_fine_samples=128 --run_fine=1
  --skips_fine=4"

train_stage () {  # $1 = name, $2 = dataset dir, $3 = target epochs,
                  # $4 = timeout, rest = train flags
  local NAME=$1 DS=$2 TARGET=$3 TMO=$4; shift 4
  local RUN RESUME DONE LEFT
  RUN=$(for d in $(ls -dt runs/*${NAME}* 2>/dev/null); do
          [ -f "$d/train_state.npz" ] && { echo "$d"; break; }; done)
  if [ -n "$RUN" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$RUN/train_state.npz')['epoch'])+1)")
    RESUME="--load_run=$RUN"
  else
    DONE=0; RESUME=""
  fi
  LEFT=$((TARGET - DONE))
  log "stage $NAME: $DONE/$TARGET epochs done"
  if [ "$LEFT" -gt 0 ]; then
    bash scripts/stall_guard.sh 1200 timeout "$TMO" python train.py "$@" \
        $RESUME --num_epochs=$LEFT --experiment_name="$NAME" || return 1
  fi
  RUN=$(ls -dt runs/*${NAME}* | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/scores.json" ]; then
    bash scripts/stall_guard.sh 1200 timeout 3600 python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384 | tee "$RUN/inference.log" || return 1
  fi
  commit_artifacts "$NAME" "$RUN/val_curve.json" "$RUN/renders_val/scores.json" \
      "$RUN/inference.log"
}

stage_append_teacher () {
  train_stage append_armsweep_256 data/armsweep_256_aa 20 10800 -- \
      $APPEND_COMMON --dataset_dir=data/armsweep_256_aa
}

stage_pose_distill () {
  [ -f artifacts/round5/distill_pose/scores.json ] && return 0
  local TRUN
  TRUN=$(ls -dt runs/*append_armsweep_256 2>/dev/null | head -1)
  [ -z "$TRUN" ] || [ ! -d "$TRUN/best" ] && { log "no append teacher"; return 1; }
  local OUT=runs/distill_r5_pose
  if [ ! -f "$OUT/scores.json" ]; then
    bash scripts/stall_guard.sh 1200 timeout 10800 python tools/distill_run.py --run_dir="$TRUN/best" \
        --dataset_dir=data/armsweep_256_aa/val --out_dir="$OUT" \
        --pose_image=0 --grid=20 --hidden=32 --steps=20000 --batch=8192 \
        --samples=192 --chunk=4096 --tile=256 --finetune_steps=10000 \
        --finetune_batch=4096 --finetune_samples=96 --finetune_lr=3e-4 \
        --ess=1 2>&1 | tee "$OUT.log" || return 1
    [ -f "$OUT/scores.json" ] || return 1
  fi
  cp "$OUT.log" "$OUT/distill.log" 2>/dev/null
  commit_artifacts distill_pose "$OUT/scores.json" "$OUT/distill.log"
}

stage_grid_canonical () {
  train_stage grid_canonical_nerf data/canonical_256 30 10800 -- \
      --config=/dev/null --dataset_dir=data/canonical_256 \
      --model_type=nerf --grid_encoding=1 --batchsize=2048 --batchsize_val=4096 \
      --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=1 \
      --white_background=1 --near=1.0 --far=4.0 --lrate=5e-4 \
      --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
      --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
      --number_validation_images=0 --render_gif=0
}

stage_grid_walking () {
  train_stage grid_walking_append data/walking_256_aa 50 18000 -- \
      $APPEND_COMMON --dataset_dir=data/walking_256_aa --grid_encoding=1
}

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-20}); do
  log "=== attempt $ATTEMPT ==="
  if bash scripts/wait_for_tpu.sh --max-wait 14400 \
     && stage_distill_static \
     && stage_bench_phase \
     && stage_append_teacher \
     && stage_pose_distill \
     && stage_grid_canonical \
     && stage_grid_walking; then
    log "=== chain 2 complete ==="
    python tools/check_landed.py || log "check_landed flagged stranded results"
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
