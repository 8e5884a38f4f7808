#!/bin/bash
# Round-4 TPU queue tail — takes over from round4_queue3.sh after its
# classical-baselines stage. Reordering rationale vs queue3's stages 3-8:
# the wall clock is the binding constraint, so stages are sorted by
# completed-table value per TPU-minute:
#   1. OOD rows for the four parallel checkpoints that already exist
#      (priority kinds: the VERDICT's minimum is Shepp-Logan, one
#      feature-lacking family, and the HU volume),
#   2. the radial s4 cells (sweep 4x points + OOD/noise checkpoints),
#   3. radial OOD rows + the clean-trained noisy-eval row (one infer —
#      proves the k-space noise model end-to-end at eval),
#   4. per-sparsity bench rows (cheap),
#   5. the noise-TRAINED radial arm,
#   6. remaining OOD kinds, radial 8x, OOD-row unlockers (lpd/fan s4),
#      radial 2x, lpd 8x/2x.
# Every stage is individually resumable (artifact-exists skip +
# train.py checkpoint auto-resume), so killing this script at the
# wall-clock cutoff loses at most the in-flight cell's last ~300 steps.
#
#   nohup bash scripts/round4_tail.sh [WAIT_PID] > /tmp/round4_tail.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PY=python
PRIORITY_KINDS=shepp_logan,textured,hu_volume

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "=== waiting for pid $1 to release the TPU ===" >&2
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

stage() {
  echo "=== [$(date +%H:%M:%S)] stage: $* ===" >&2
  "$@" || echo "!!! stage failed (continuing): $*" >&2
}

# 1. OOD priority kinds for the parallel checkpoints that already exist.
stage $PY scripts/ood_eval.py --kinds $PRIORITY_KINDS \
  --presets pdunet_parallel,fbp_unet_parallel,sino_unet_parallel,lpd_parallel

# 2. Radial s4 cells (half sample budget per queue3: radial steps cost ~2x).
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 4 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 4 --samples 48000

# 3. Radial OOD priority kinds + the clean-trained noisy-eval row.
stage $PY scripts/ood_eval.py --kinds $PRIORITY_KINDS \
  --presets pdunet_radial,sino_unet_radial
NSETS="--set=geometry.sparsity=4 --set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150 --set=train.eval_every=300 --set=train.ckpt_every=300 --set=train.kspace_snr_db=30"
if [ -d runs/sweep/pdunet_radial_s4/best ] && [ ! -f artifacts/noisy_radial_cleantrained_noisy.json ]; then
  stage $PY infer.py --preset pdunet_radial $NSETS \
    --ckpt-dir runs/sweep/pdunet_radial_s4 --ckpt best --n-slices 64 \
    --corrupt --json-out artifacts/noisy_radial_cleantrained_noisy.json
fi

# 4. Per-sparsity throughput rows for the flagship (recon-only, ~2 min).
if [ ! -f artifacts/bench_sparsity_rows.jsonl ]; then
  for K in 2 8; do
    stage sh -c "$PY bench.py --preset-recon pdunet_parallel --batch 256 --sparsity $K >> artifacts/bench_sparsity_rows.jsonl"
  done
fi

# 5. Noise-trained radial arm (VERDICT #5 remainder).
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

# 5b. Re-run the fbp_unet_parallel 2x cell lost to a wedged axon RPC
#     (the 22:47 launch never reached step 100; the client was killed and
#     the TPU probed healthy afterwards). Completes the fbp sweep row.
stage $PY scripts/acceleration_sweep.py --presets fbp_unet_parallel --sparsities 2

# 6. Remaining OOD kinds for every checkpoint trained so far.
stage $PY scripts/ood_eval.py

# 7. Radial 8x — the harder, more interesting MRI acceleration factor.
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 8 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 8 --samples 48000
stage $PY scripts/acceleration_sweep.py --table-only

# 8. OOD-row unlockers: lpd (4th CT method at matched budget) and fan
#    (3rd geometry), then their OOD rows.
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4
stage $PY scripts/acceleration_sweep.py --presets pdunet_fan --sparsities 4
stage $PY scripts/ood_eval.py

# 9. Radial 2x, then LPD completes the CT acceleration axis.
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 8,2

# 10. Rebuild the combined table strictly from existing cells.
stage $PY scripts/acceleration_sweep.py --table-only

echo "=== [$(date +%H:%M:%S)] tail drained ===" >&2
