#!/bin/bash
# Round-5 unified TPU supervisor — merges chains 1+2 in VALUE order, so a
# tunnel outage eats the stretch goals, not the headline items:
#   1. t30 ridge probes (VERDICT 4)                      ~30 min
#   2. canonical data + nerf teacher (prereq 2/3)        ~80 min
#   3. distill through the round-5 TILED path, 20k+20k   ~2.5 h  (VERDICT 2+3)
#   4. bench.py second chip phase                        ~40 min (VERDICT 8)
#   5. walking data + ridge-winner converge + walking    ~2 h    (VERDICT 4)
#   6. append teacher + per-pose distill                 ~3 h    (VERDICT 6)
#   7. GridNerf canonical evidence                       ~1 h    (VERDICT 5)
#   8. GridNerf walking flagship (stretch)               ~3 h
# Every python invocation rides scripts/stall_guard.sh (1200 s of silence ->
# kill + retry); stages are idempotent/resumable; artifacts commit the moment
# a stage finishes. SINGLE TPU OWNER — never launch a second supervisor.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp_cache}
mkdir -p artifacts/round5/sweep runs data

log () { echo "[round5-main $(date -u +%H:%M:%S)] $*"; }
GUARD="bash scripts/stall_guard.sh 1200"

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

ADS=data/armsweep_256_aa
WDS=data/walking_256_aa
dyn_flags () {  # $1 = dataset dir — identical to the round-4 sweep recipe
  echo "--config=/dev/null --dataset_dir=$1 --batchsize=2048
    --batchsize_val=4096 --sigma_noise_std=1 --white_background=1 --near=1.0
    --far=4.0 --skips=4 --lrate=5e-4 --compute_dtype=bfloat16 --use_pallas=1
    --scan_steps=16 --foreground_sample_ratio=0.5 --val_rays=131072
    --number_validation_images=0 --render_gif=0 --param_ema=0.999
    --model_type=dummy_dynamic --number_coarse_samples=64 --run_fine=0
    --images_per_batch=8"
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

# ---------- data ----------

stage_data_armsweep () {
  [ -d "$ADS/train" ] && return 0
  $GUARD timeout 2400 python create_dataset.py --save_dir="$ADS" \
      --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
      --number_steps=12 --multi_human_pose=1 --human_number_steps=24 \
      --human_start_angle=0 --human_end_angle=60 --supersample=2
}

stage_data_canonical () {
  [ -d data/canonical_256/train ] && return 0
  $GUARD timeout 1800 python create_dataset.py --save_dir=data/canonical_256 \
      --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
      --number_steps=40 --multi_human_pose=1 --human_number_steps=1 \
      --human_start_angle=0 --human_end_angle=0
}

stage_data_walking () {
  [ -d "$WDS/train" ] && return 0
  [ -f data/walking_24.npz ] || timeout 1200 python tools/make_walking_sequence.py \
      --out data/walking_24.npz --frames 24 --cycles 1 || return 1
  $GUARD timeout 2400 python create_dataset.py --save_dir="$WDS" \
      --dataset_type=smpl_nerf --resolution=256 --camera_path=circle \
      --number_steps=12 --multi_human_pose=1 \
      --smpl_sequence_file=data/walking_24.npz --sequence_skip=1 --supersample=2
}

# ---------- generic train/score ----------

train_stage () {  # $1 = name, $2 = dataset dir, $3 = target epochs,
                  # $4 = timeout, rest = train flags
  local NAME=$1 DS=$2 TARGET=$3 TMO=$4; shift 4
  [ "${1:-}" = "--" ] && shift  # tolerate a visual separator; train.py rejects a bare --
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
    $GUARD timeout "$TMO" python train.py "$@" $RESUME --num_epochs=$LEFT \
        --experiment_name="$NAME" || return 1
  fi
  RUN=$(ls -dt runs/*${NAME}* | head -1)
  if [ -d "$RUN/best" ] && [ ! -f "$RUN/renders_val/scores.json" ]; then
    $GUARD timeout 3600 python inference.py --inf_run_dir="$RUN/best" \
        --inf_ground_truth_dir="$DS/val" --inf_save_dir="$RUN/renders_val" \
        --inf_batchsize=16384 > "$RUN/inference.log" 2>&1 || return 1
  fi
  commit_artifacts "$NAME" "$RUN/val_curve.json" "$RUN/renders_val/scores.json" \
      "$RUN/inference.log"
}

# ---------- 1. ridge probes ----------

probe () {  # $1 = radius, $2 = temperature (6-epoch ridge probe)
  local NAME=dynsweep_r$1_t$2
  [ -f "artifacts/round5/sweep/${NAME}_val_curve.json" ] && return 0
  local RUN
  RUN=$(ls -dt runs/*${NAME} 2>/dev/null | head -1)
  if [ -z "$RUN" ] || [ ! -f "$RUN/val_curve.json" ] \
     || [ "$(python -c "import json;print(len(json.load(open('$RUN/val_curve.json'))))" 2>/dev/null)" -lt 6 ]; then
    $GUARD timeout 3600 python train.py $(dyn_flags $ADS) --warp_radius=$1 \
        --warp_temperature=$2 --steps_per_epoch=1000 --num_epochs=6 \
        --experiment_name=$NAME || return 1
    RUN=$(ls -dt runs/*${NAME} | head -1)
  fi
  cp "$RUN/val_curve.json" "artifacts/round5/sweep/${NAME}_val_curve.json"
  git add artifacts/round5/sweep >/dev/null 2>&1
  git commit -q -m "artifacts: round-5 ridge probe $NAME" \
      -- artifacts/round5/sweep || true
}

# ---------- 2. canonical teacher ----------

stage_teacher () {
  local CANON DONE=0 RESUME=""
  CANON=$(for d in $(ls -dt runs/*canonical_nerf_256 2>/dev/null); do
            [ -f "$d/train_state.npz" ] && { echo "$d"; break; }; done)
  if [ -n "$CANON" ]; then
    DONE=$(python -c "import numpy as np; print(int(np.load('$CANON/train_state.npz')['epoch'])+1)")
    RESUME="--load_run=$CANON"
  fi
  if [ "$DONE" -lt 30 ]; then
    $GUARD timeout 7200 python train.py --config=/dev/null \
      --dataset_dir=data/canonical_256 \
      --model_type=nerf --batchsize=2048 --batchsize_val=4096 \
      --number_coarse_samples=64 --run_fine=0 --sigma_noise_std=1 \
      --white_background=1 --near=1.0 --far=4.0 --skips=4 --lrate=5e-4 \
      --compute_dtype=bfloat16 --use_pallas=1 --scan_steps=16 \
      --foreground_sample_ratio=0.5 --steps_per_epoch=2000 --val_rays=131072 \
      --number_validation_images=0 --render_gif=0 $RESUME \
      --num_epochs=$((30 - DONE)) --experiment_name=canonical_nerf_256 || return 1
  fi
  CANON=$(ls -dt runs/*canonical_nerf_256 | head -1)
  commit_artifacts teacher_canonical "$CANON/val_curve.json"
}

# ---------- 3. tiled distill (headline) ----------

stage_distill_static () {
  [ -f artifacts/round5/distill_static/scores.json ] && return 0
  local TRUN
  TRUN=$(ls -dt runs/*canonical_nerf_256 2>/dev/null | head -1)
  if [ -z "$TRUN" ] || [ ! -d "$TRUN/best" ]; then
    log "no canonical teacher"; return 1
  fi
  local OUT=runs/distill_r5_static
  if [ ! -f "$OUT/scores.json" ]; then
    $GUARD timeout 14400 python tools/distill_run.py --run_dir="$TRUN/best" \
        --dataset_dir=data/canonical_256/val --out_dir="$OUT" \
        --grid=20 --hidden=32 --steps=20000 --batch=8192 --samples=192 \
        --chunk=4096 --tile=256 --finetune_steps=20000 --finetune_batch=4096 \
        --finetune_samples=96 --finetune_lr=3e-4 --ess=1 \
        > "$OUT.log" 2>&1 || { tail -5 "$OUT.log"; return 1; }
    [ -f "$OUT/scores.json" ] || return 1
  fi
  cp "$OUT.log" "$OUT/distill.log" 2>/dev/null
  commit_artifacts distill_static "$OUT/scores.json" "$OUT/distill.log"
}

# ---------- 3b. round-5 serving re-measure (culled path + kernel fix +
# phase-2 finetune) — resumes the saved fields, so it only pays for the
# finetune2 steps, the re-scores, and the latency timings ----------

stage_distill_remeasure () {
  [ -f artifacts/round5/distill_static_v2/scores.json ] && return 0
  local TRUN
  TRUN=$(ls -dt runs/*canonical_nerf_256 2>/dev/null | head -1)
  if [ -z "$TRUN" ] || [ ! -d "$TRUN/best" ]; then
    log "no canonical teacher"; return 1
  fi
  local OUT=runs/distill_r5_static
  $GUARD timeout 14400 python tools/distill_run.py --run_dir="$TRUN/best" \
      --dataset_dir=data/canonical_256/val --out_dir="$OUT" \
      --grid=20 --hidden=32 --steps=20000 --batch=8192 --samples=192 \
      --chunk=4096 --tile=256 --finetune_steps=20000 --finetune_batch=4096 \
      --finetune_samples=96 --finetune_lr=3e-4 \
      --finetune2_steps=20000 --finetune2_lr=1e-4 \
      --ess=1 --also_bucketed=0 --time_tiles= \
      > "$OUT.v2.log" 2>&1 || { tail -5 "$OUT.v2.log"; return 1; }
  [ -f "$OUT/scores.json" ] || return 1
  cp "$OUT.v2.log" "$OUT/distill_v2.log" 2>/dev/null
  commit_artifacts distill_static_v2 "$OUT/scores.json" "$OUT/distill_v2.log"
}

# ---------- 4. bench second phase ----------

stage_bench_phase () {
  [ -f artifacts/round5/bench_phase/bench_phase_a.json ] && return 0
  mkdir -p artifacts/round5/bench_phase
  $GUARD timeout 5400 python bench.py \
      > artifacts/round5/bench_phase/bench_phase_a.json \
      2> artifacts/round5/bench_phase/bench_phase_a.log || return 1
  commit_artifacts bench_phase artifacts/round5/bench_phase/bench_phase_a.json \
      artifacts/round5/bench_phase/bench_phase_a.log
}

# phase b: a SECOND session's chip draw for the render-latency headline
# (phase a ran in the previous driver session; BENCH_r04 is a third draw)
stage_bench_phase_b () {
  [ -f artifacts/round5/bench_phase/bench_phase_b.json ] && return 0
  mkdir -p artifacts/round5/bench_phase
  $GUARD timeout 5400 python bench.py \
      > artifacts/round5/bench_phase/bench_phase_b.json \
      2> artifacts/round5/bench_phase/bench_phase_b.log || return 1
  commit_artifacts bench_phase artifacts/round5/bench_phase/bench_phase_b.json \
      artifacts/round5/bench_phase/bench_phase_b.log
}

# ---------- 5. ridge winner converge + walking rerun ----------

pick_best () {  # argmax over ALL committed probe curves + fresh runs
  python - <<'EOF'
import glob, json, os
best, arg = -1, None
curves = {}
for f in (glob.glob("artifacts/round4/sweep/dynsweep_*_val_curve.json")
          + glob.glob("artifacts/round5/sweep/dynsweep_*_val_curve.json")):
    name = os.path.basename(f).replace("_val_curve.json", "")
    curves[name] = f
for d in glob.glob("runs/*dynsweep_r*"):
    f = os.path.join(d, "val_curve.json")
    if os.path.exists(f):
        curves["dynsweep_" + os.path.basename(d).split("dynsweep_")[1]] = f
for name, f in curves.items():
    try:
        p = json.load(open(f))[-1]["psnr_estimate"]
    except Exception:
        continue
    if p > best:
        best, arg = p, name.split("dynsweep_")[1]
print(arg or "")
EOF
}

train_converged () {  # $1 = name, $2 = dataset, $3 = radius, $4 = temp, $5 = epochs
  local NAME=$1 DS=$2 R=$3 T=$4 TARGET=$5
  train_stage "$NAME" "$DS" "$TARGET" 10800 -- $(dyn_flags $DS) \
      --warp_radius=$R --warp_temperature=$T --steps_per_epoch=2000
}

stage_converge_and_walk () {
  local BEST R T
  BEST=$(pick_best)
  [ -z "$BEST" ] && return 1
  R=${BEST%%_t*}; R=${R#r}
  T=${BEST##*_t}
  log "ridge winner: radius=$R temperature=$T"
  if [ "$R" = "0.7" ] && [ "$T" = "100" ]; then
    log "winner already converged round 4 (dynbest2_r0.7_t100 -> 37.04)"
  else
    train_converged "dynbest3_r${R}_t${T}" $ADS $R $T 20 || return 1
  fi
  train_converged "dynsoft2_walking_r${R}_t${T}" $WDS $R $T 20
}

# ---------- 6. append teacher + per-pose distill ----------

stage_append_teacher () {
  train_stage append_armsweep_256 data/armsweep_256_aa 20 14400 -- \
      $APPEND_COMMON --dataset_dir=data/armsweep_256_aa --steps_per_epoch=2000
}

stage_pose_distill () {
  [ -f artifacts/round5/distill_pose/scores.json ] && return 0
  local TRUN
  TRUN=$(ls -dt runs/*append_armsweep_256 2>/dev/null | head -1)
  if [ -z "$TRUN" ] || [ ! -d "$TRUN/best" ]; then
    log "no append teacher"; return 1
  fi
  local OUT=runs/distill_r5_pose
  if [ ! -f "$OUT/scores.json" ]; then
    $GUARD timeout 10800 python tools/distill_run.py --run_dir="$TRUN/best" \
        --dataset_dir=data/armsweep_256_aa/val --out_dir="$OUT" \
        --pose_image=0 --grid=20 --hidden=32 --steps=20000 --batch=8192 \
        --samples=192 --chunk=4096 --tile=256 --finetune_steps=10000 \
        --finetune_batch=4096 --finetune_samples=96 --finetune_lr=3e-4 \
        --finetune2_steps=10000 --finetune2_lr=1e-4 \
        --ess=1 --also_bucketed=0 --time_tiles= \
        > "$OUT.log" 2>&1 || { tail -5 "$OUT.log"; return 1; }
    [ -f "$OUT/scores.json" ] || return 1
  fi
  cp "$OUT.log" "$OUT/distill.log" 2>/dev/null
  commit_artifacts distill_pose "$OUT/scores.json" "$OUT/distill.log"
}

# ---------- 7/8. GridNerf evidence ----------

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

# ---------- supervisor loop ----------

for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-40}); do
  log "=== attempt $ATTEMPT ==="
  # Session-2 order: the wiped disk makes the teacher a prerequisite again;
  # the headline re-measure (VERDICT 2+3) goes first, then the flagship-family
  # pose distill (6), GridNerf evidence (5), bench phase b (8), and the
  # walking stretch goals last so an outage eats them, not the headline.
  if bash scripts/wait_for_tpu.sh --max-wait 14400 \
     && stage_data_canonical \
     && stage_teacher \
     && stage_distill_static \
     && stage_distill_remeasure \
     && stage_data_armsweep \
     && probe 0.9 30 \
     && probe 1.2 30 \
     && stage_append_teacher \
     && stage_pose_distill \
     && stage_grid_canonical \
     && stage_bench_phase \
     && stage_bench_phase_b \
     && stage_data_walking \
     && stage_converge_and_walk \
     && stage_grid_walking; then
    log "=== round-5 main chain complete ==="
    python tools/check_landed.py || log "check_landed flagged stranded results"
    exit 0
  fi
  log "=== attempt $ATTEMPT failed — retrying in 120s ==="
  sleep 120
done
log "gave up"
exit 1
