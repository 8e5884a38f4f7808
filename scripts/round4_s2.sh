#!/bin/bash
# Round-4 session-2 TPU queue. The VM was reset between sessions: every
# artifact JSON survives in git, but runs/ (all checkpoints) was wiped, so
# OOD rows need their s4 checkpoints retrained. Stages are ordered by
# completed-table value per TPU-minute:
#   1. radial s4 cells (the title modality has zero sweep cells; also
#      unlocks radial OOD + the clean-trained noisy-eval row),
#   2. radial OOD priority kinds + noisy-eval row,
#   3. lpd s4 + fan s4 (each is BOTH a missing sweep cell and an OOD ckpt),
#   4. their OOD priority kinds,
#   5. ckpt-only retrains of the three parallel s4 cells (artifacts exist;
#      train.py only, no infer) to unlock their OOD rows,
#   6. their OOD priority kinds,
#   7. fbp 2x (completes the fbp sweep row),
#   8. radial 8x cells, then the noise-trained radial arm,
#   9. per-sparsity bench rows (cheap),
#  10. remaining OOD kinds, radial 2x, lpd 8x/2x, final table rebuild.
# Every stage skips work whose artifact/checkpoint already exists, so the
# script is killable and resumable at any point.
#
#   nohup bash scripts/round4_s2.sh > /tmp/round4_s2.log 2>&1 &
#   echo $! > /tmp/round4_s2.pid
set -u
cd "$(dirname "$0")/.."
PY=python
PRIORITY_KINDS=shepp_logan,textured,hu_volume
SWEEP_SETS="--set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150 --set=train.eval_every=300 --set=train.ckpt_every=300"

stage() {
  echo "=== [$(date +%H:%M:%S)] stage: $* ===" >&2
  "$@" || echo "!!! stage failed (continuing): $*" >&2
}

# Retrain a parallel s4 checkpoint whose sweep artifact already exists
# (acceleration_sweep.py would skip the cell, but OOD eval needs the ckpt).
retrain_ckpt() {  # $1 = preset
  local ckpt="runs/sweep/$1_s4"
  if [ -d "$ckpt/best" ]; then
    echo "[skip] $1_s4 ckpt exists" >&2
    return 0
  fi
  stage $PY train.py --preset "$1" --steps 3000 \
    --set=geometry.sparsity=4 $SWEEP_SETS \
    --ckpt-dir "$ckpt" --metrics "$ckpt/metrics.jsonl"
}

# 1. Radial s4 cells (half sample budget: radial steps cost ~2x).
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 4 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 4 --samples 48000

# 2. Radial OOD priority kinds + the clean-trained noisy-eval row.
stage $PY scripts/ood_eval.py --kinds $PRIORITY_KINDS \
  --presets pdunet_radial,sino_unet_radial
NSETS="--set=geometry.sparsity=4 $SWEEP_SETS --set=train.kspace_snr_db=30"
if [ -d runs/sweep/pdunet_radial_s4/best ] && [ ! -f artifacts/noisy_radial_cleantrained_noisy.json ]; then
  stage $PY infer.py --preset pdunet_radial $NSETS \
    --ckpt-dir runs/sweep/pdunet_radial_s4 --ckpt best --n-slices 64 \
    --corrupt --json-out artifacts/noisy_radial_cleantrained_noisy.json
fi

# 3. lpd + fan s4: missing sweep cells that double as OOD checkpoints.
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4
stage $PY scripts/acceleration_sweep.py --presets pdunet_fan --sparsities 4

# 4. Their OOD priority kinds.
stage $PY scripts/ood_eval.py --kinds $PRIORITY_KINDS \
  --presets lpd_parallel,pdunet_fan

# 5./6. Parallel s4 ckpt retrains + OOD priority kinds.
retrain_ckpt pdunet_parallel
stage $PY scripts/ood_eval.py --kinds $PRIORITY_KINDS --presets pdunet_parallel
retrain_ckpt fbp_unet_parallel
retrain_ckpt sino_unet_parallel
stage $PY scripts/ood_eval.py --kinds $PRIORITY_KINDS \
  --presets fbp_unet_parallel,sino_unet_parallel

# 7. fbp 2x — completes the fbp sweep row (lost twice to a wedged axon RPC).
stage $PY scripts/acceleration_sweep.py --presets fbp_unet_parallel --sparsities 2

# 8. Radial 8x, then the noise-trained radial arm (VERDICT #5 remainder).
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 8 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 8 --samples 48000
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --json-out artifacts/noisy_radial_snr30_clean.json
  stage $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
fi

# 9. Per-sparsity throughput rows for the flagship (recon-only, ~2 min).
if [ ! -f artifacts/bench_sparsity_rows.jsonl ]; then
  for K in 2 8; do
    stage sh -c "$PY bench.py --preset-recon pdunet_parallel --batch 256 --sparsity $K >> artifacts/bench_sparsity_rows.jsonl"
  done
fi

# 10. Remaining OOD kinds, radial 2x, lpd 8x/2x, final table rebuild.
stage $PY scripts/ood_eval.py
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 8,2
stage $PY scripts/acceleration_sweep.py --table-only
stage $PY scripts/ood_eval.py

echo "=== [$(date +%H:%M:%S)] session-2 queue drained ===" >&2
