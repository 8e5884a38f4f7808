#!/bin/bash
# Round-5 final tail — replaces round5_s2c.sh's tail after the
# sino_unet_parallel unlock, ordered so the session cut cannot strand a
# verdict item: the SNR-30 noise arm (needs no new checkpoint) runs FIRST,
# then the two gap probes whose checkpoints exist, then the radial unlock
# and its probe, then catch-alls.
#
#   nohup bash scripts/round5_s2d.sh > /tmp/round5_s2d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PY=python
export PDUNET_WATCHDOG_SECS=${PDUNET_WATCHDOG_SECS:-600}
START=$(date +%s)
DEADLINE=${DEADLINE:-7200}

SWEEP_SETS="--set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150"

stage() {
  local t=$1; shift
  local now=$(( $(date +%s) - START ))
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "=== [$(date +%H:%M:%S)] deadline (${now}s): skipping: $*" >&2
    return 0
  fi
  echo "=== [$(date +%H:%M:%S)] stage (t=${now}s): $*" >&2
  timeout -k 30 "$t" "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "!!! stage rc=$rc, retrying once: $*" >&2
    timeout -k 30 "$t" "$@" || echo "!!! retry failed (continuing): $*" >&2
  fi
  return 0
}

publish() {
  $PY scripts/acceleration_sweep.py --table-only >/dev/null || true
  $PY scripts/results_tables.py --update-readme >/dev/null || true
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet || git commit -q -m "$1"
}

# ---- 1. Noise-trained radial arm (VERDICT r4 #3) -------------------------
NSETS="--set=geometry.sparsity=4 $SWEEP_SETS --set=train.kspace_snr_db=30"
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage 2400 $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --set=train.eval_every=150 --set=train.ckpt_every=150 \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage 1200 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 \
    --json-out artifacts/noisy_radial_snr30_clean.json
  stage 1200 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
  publish "Train pdunet_radial at SNR 30 dB; land both noise-table arms"
fi

# ---- 2. Gap probes with existing checkpoints -----------------------------
stage 2400 $PY scripts/ood_analysis.py --presets lpd_parallel \
  --kinds indist,hu_volume,textured --amplitudes 0.25,0.5,1.0
publish "OOD gap attribution: lpd hu_volume/textured probe"
stage 2400 $PY scripts/ood_analysis.py --presets sino_unet_parallel \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
publish "OOD gap attribution: sino_unet_parallel shepp_logan probe"

# ---- 3. Radial unlock + its probe ---------------------------------------
if [ ! -d "runs/sweep/pdunet_radial_s4/best" ]; then
  stage 2400 $PY train.py --preset pdunet_radial --steps 1500 \
    --set=geometry.sparsity=4 $SWEEP_SETS \
    --set=train.eval_every=150 --set=train.ckpt_every=150 \
    --ckpt-dir runs/sweep/pdunet_radial_s4 \
    --metrics runs/sweep/pdunet_radial_s4/metrics.jsonl
fi
stage 2400 $PY scripts/ood_eval.py --presets pdunet_radial --force
publish "Rebuild pdunet_radial s4 checkpoint; score its full OOD row"
stage 2400 $PY scripts/ood_analysis.py --presets pdunet_radial \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
publish "OOD gap attribution: pdunet_radial shepp_logan probe"

# ---- 4. Catch-alls (cheap; skip on artifacts) ----------------------------
ood_unlock() {
  local P=$1 STEPS=$2 T=$3
  local EVERY=$(( STEPS / 10 ))
  if [ ! -d "runs/sweep/${P}_s4/best" ]; then
    stage "$T" $PY train.py --preset "$P" --steps "$STEPS" \
      --set=geometry.sparsity=4 $SWEEP_SETS \
      --set=train.eval_every=$EVERY --set=train.ckpt_every=$EVERY \
      --ckpt-dir "runs/sweep/${P}_s4" \
      --metrics "runs/sweep/${P}_s4/metrics.jsonl"
  fi
  stage 3000 $PY scripts/ood_eval.py --presets "$P" --force
  publish "Rebuild ${P} s4 checkpoint; score its full OOD row"
}
ood_unlock fbp_unet_parallel 3000 1800
ood_unlock sino_unet_radial 1500 2700
stage 3600 $PY scripts/ood_analysis.py
publish "OOD gap attribution: anchor + DC-residual cells for the full table"

echo "=== [$(date +%H:%M:%S)] s2d drained (t=$(( $(date +%s) - START ))s) ===" >&2
