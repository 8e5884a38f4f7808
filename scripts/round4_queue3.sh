#!/bin/bash
# Round-4 TPU work queue, v3 — final ordering. Differences vs v2: the
# radial 8x/2x cells (the paper's title axis for its second modality)
# outrank the LPD cells, and cheap per-sparsity bench recon rows land
# right after the OOD/noise stages. Strictly sequential (single-client
# TPU); every stage is individually resumable.
#
#   nohup bash scripts/round4_queue3.sh [WAIT_PID] > /tmp/round4_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PY=python

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "=== waiting for pid $1 to release the TPU ===" >&2
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

stage() {
  echo "=== [$(date +%H:%M:%S)] stage: $* ===" >&2
  "$@" || echo "!!! stage failed (continuing): $*" >&2
}

# 1. Finish the parallel-CT quality-vs-acceleration sweep (VERDICT #1).
stage $PY scripts/acceleration_sweep.py --presets pdunet_parallel --sparsities 4,8,2
stage $PY scripts/acceleration_sweep.py --presets sino_unet_parallel --sparsities 4,8,2
stage $PY scripts/acceleration_sweep.py --presets fbp_unet_parallel --sparsities 4,8,2

# 2. Classical (non-learned) anchors per factor — cheap, fwd-only.
stage $PY scripts/classical_baselines.py

# 3. Radial s4 cells first: they double as the OOD checkpoints.
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 4 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 4 --samples 48000

# 4. OOD evaluation of every _s4 sweep checkpoint (VERDICT #2).
stage $PY scripts/ood_eval.py

# 5. Noisy-radial training row (VERDICT #5 remainder).
NOISY=runs/noisy/pdunet_radial_snr30
NSETS="--set=geometry.sparsity=4 --set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150 --set=train.eval_every=300 --set=train.ckpt_every=300 --set=train.kspace_snr_db=30"
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --json-out artifacts/noisy_radial_snr30_clean.json
  stage $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
fi
if [ -d runs/sweep/pdunet_radial_s4/best ] && [ ! -f artifacts/noisy_radial_cleantrained_noisy.json ]; then
  stage $PY infer.py --preset pdunet_radial $NSETS \
    --ckpt-dir runs/sweep/pdunet_radial_s4 --ckpt best --n-slices 64 \
    --corrupt --json-out artifacts/noisy_radial_cleantrained_noisy.json
fi

# 6. Per-sparsity throughput rows for the flagship (VERDICT #1 "bench rows
#    at each factor") — recon-only, ~2 min each.
if [ ! -f artifacts/bench_sparsity_rows.jsonl ]; then
  for K in 2 8; do
    stage sh -c "$PY bench.py --preset-recon pdunet_parallel --batch 256 --sparsity $K >> artifacts/bench_sparsity_rows.jsonl"
  done
fi

# 7. Radial 8x/2x — the MRI acceleration axis.
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 8,2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 8,2 --samples 48000

# 8. LPD completes the CT method ordering (its 4x point already exists at
#    full budget from round 3; these add the 2x/8x cells).
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4,8,2

# 9. Rebuild the combined table strictly from existing cells.
stage $PY scripts/acceleration_sweep.py --table-only

echo "=== [$(date +%H:%M:%S)] queue drained ===" >&2
