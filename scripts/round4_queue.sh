#!/bin/bash
# Round-4 TPU work queue — strictly sequential (the TPU is single-client).
# Stages are ordered by VERDICT r3 priority and are individually resumable:
# acceleration_sweep.py skips cells whose artifact exists, ood_eval.py skips
# existing cells, and train.py auto-resumes from checkpoints. A failed stage
# logs and the queue moves on, so one bad cell cannot starve the rest.
#
#   nohup bash scripts/round4_queue.sh > /tmp/round4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PY=python

stage() {
  echo "=== [$(date +%H:%M:%S)] stage: $* ===" >&2
  "$@" || echo "!!! stage failed (continuing): $*" >&2
}

# 1. Quality-vs-acceleration sweep, CT parallel (VERDICT #1). s4 first per
#    preset: it doubles as the OOD checkpoint and the headline factor.
stage $PY scripts/acceleration_sweep.py --presets pdunet_parallel --sparsities 4,8,2
stage $PY scripts/acceleration_sweep.py --presets sino_unet_parallel --sparsities 4,8,2
stage $PY scripts/acceleration_sweep.py --presets fbp_unet_parallel --sparsities 4,8,2

# 2. Classical (non-learned) anchors per factor — cheap, fwd-only.
stage $PY scripts/classical_baselines.py

# 3. LPD completes the CT method ordering.
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4,8,2

# 4. Radial MRI sweep at a reduced matched budget (48k samples — the radial
#    train steps are 3-5x the parallel-CT cost; rows carry their own budget).
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 4,8,2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 4,8,2 --samples 48000

# 5. OOD evaluation of every _s4 sweep checkpoint (VERDICT #2); skips
#    presets whose checkpoint is not there yet, so rerunning is safe.
stage $PY scripts/ood_eval.py

# 6. Noisy-radial training row (VERDICT #5 remainder): train pdunet_radial
#    with complex Gaussian k-space noise at SNR 30 dB, matched 48k budget,
#    then eval clean + noisy; also eval the noiseless-trained s4 checkpoint
#    on noisy data for the robustness comparison.
NOISY=runs/noisy/pdunet_radial_snr30
NSETS="--set=geometry.sparsity=4 --set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150 --set=train.eval_every=150 --set=train.ckpt_every=150 --set=train.kspace_snr_db=30"
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

# 7. Rebuild the combined sweep table over every cell that exists (cells
#    all exist by now, so this only re-reads artifacts; any cell a failed
#    stage left missing gets trained here as a fallback).
stage $PY scripts/acceleration_sweep.py

echo "=== [$(date +%H:%M:%S)] queue drained ===" >&2
