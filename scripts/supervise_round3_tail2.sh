#!/bin/bash
# Round-3 TPU tail, reordered for value-per-minute in case the tunnel comes
# back late (it has been down for hours — see CLAUDE.md playbook):
#   1. p2p baselines for waving/arms_swinging  (~25 min, completes Table 1)
#   2. Table-2 ablation chain                  (novdi resume -> nope -> bare)
#   3. image-wise pose-lr-decay rerun          (run_round3_final.sh skips the
#      p2p stages once their scores exist)
# Every stage is idempotent/restartable; retry across tunnel outages.
# Run ONLY one instance; it is the single TPU owner.
for ATTEMPT in $(seq 1 ${MAX_ATTEMPTS:-12}); do
  echo "=== supervisor2 attempt $ATTEMPT $(date -u +%H:%M:%S) ==="
  if bash scripts/wait_for_tpu.sh bash scripts/run_p2p_baselines.sh \
     && bash scripts/wait_for_tpu.sh bash scripts/run_table2_ablations.sh \
     && bash scripts/wait_for_tpu.sh bash scripts/run_round3_final.sh; then
    echo "=== supervisor2: all stages complete $(date -u +%H:%M:%S) ==="
    exit 0
  fi
  echo "=== attempt $ATTEMPT failed (likely tunnel drop) — retrying in 180s ==="
  sleep 180
done
echo "=== supervisor2: gave up after ${MAX_ATTEMPTS:-12} attempts ===" >&2
exit 1
