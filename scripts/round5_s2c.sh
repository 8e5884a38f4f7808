#!/bin/bash
# Round-5 session-2 continuation — takes over from round5_s2.sh after its
# stage B (the remaining sweep cells), re-prioritized for the time left in
# the round:
#   1. the pdunet_radial 2x cell that OOMed before the remat rule landed,
#   2. the four highest-value OOD checkpoint rebuilds + full rows
#      (pdunet_parallel, pdunet_fan — its first OOD row — and the two
#      gap-analysis presets sino_unet_parallel / pdunet_radial; the fbp
#      and sino_unet_radial unlocks are deferred to the time-permitting
#      tail: their r4 shepp/textured rows stand and their remaining kinds
#      are the least informative cells in the table),
#   3. the ood_analysis amplitude probes for the three documented >3 dB
#      gaps (needs 2's checkpoints),
#   4. the SNR-30-trained radial arm,
#   5. time-permitting: the deferred unlocks, the full anchor/residual
#      analysis table, the bench-matrix r04 stamp, chunked stem-2.
#
#   nohup bash scripts/round5_s2c.sh > /tmp/round5_s2c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PY=python
export PDUNET_WATCHDOG_SECS=${PDUNET_WATCHDOG_SECS:-600}
START=$(date +%s)
DEADLINE=${DEADLINE:-18000}

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

# ---- 1. pdunet_radial 2x (remat rule now in cell_sets) -------------------
stage 3000 $PY scripts/acceleration_sweep.py --presets pdunet_radial \
  --sparsities 2 --samples 48000
publish "Land pdunet_radial 2x sweep cell (remat'd 256-spoke unroll)"

# ---- 2. OOD unlocks, value-ordered ---------------------------------------
ood_unlock() {  # ood_unlock <preset> <steps> <timeout>
  local P=$1 STEPS=$2 T=$3
  local EVERY=$(( STEPS / 10 ))
  local EXTRA=
  [ "${P#lpd}" != "$P" ] && EXTRA="--set=model.remat=true"
  if [ ! -d "runs/sweep/${P}_s4/best" ]; then
    stage "$T" $PY train.py --preset "$P" --steps "$STEPS" \
      --set=geometry.sparsity=4 $SWEEP_SETS $EXTRA \
      --set=train.eval_every=$EVERY --set=train.ckpt_every=$EVERY \
      --ckpt-dir "runs/sweep/${P}_s4" \
      --metrics "runs/sweep/${P}_s4/metrics.jsonl"
  fi
  stage 3000 $PY scripts/ood_eval.py --presets "$P" --force
  publish "Rebuild ${P} s4 checkpoint; score its full OOD row"
}
ood_unlock pdunet_parallel 3000 2700
ood_unlock pdunet_fan 3000 2400
ood_unlock sino_unet_parallel 3000 2100
ood_unlock pdunet_radial 1500 2400

# ---- 3. Gap-attribution probes (lpd ckpt exists from stage A) ------------
stage 2700 $PY scripts/ood_analysis.py --presets lpd_parallel \
  --kinds indist,hu_volume,textured --amplitudes 0.25,0.5,1.0
stage 2700 $PY scripts/ood_analysis.py --presets sino_unet_parallel \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
stage 2700 $PY scripts/ood_analysis.py --presets pdunet_radial \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
publish "OOD gap attribution: amplitude probes + anchors for the three >3 dB gaps"

# ---- 4. Noise-trained radial arm ----------------------------------------
NSETS="--set=geometry.sparsity=4 $SWEEP_SETS --set=train.kspace_snr_db=30"
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage 2700 $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --set=train.eval_every=150 --set=train.ckpt_every=150 \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage 1500 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 \
    --json-out artifacts/noisy_radial_snr30_clean.json
  stage 1500 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
  publish "Train pdunet_radial at SNR 30 dB; land both noise-table arms"
fi

# ---- 5. Time-permitting tail --------------------------------------------
ood_unlock fbp_unet_parallel 3000 1800
ood_unlock sino_unet_radial 1500 2700
stage 3600 $PY scripts/ood_analysis.py
publish "OOD gap attribution: anchor + DC-residual cells for the full table"
if [ ! -f artifacts/bench_matrix_r04.jsonl ]; then
  stage 4800 $PY bench.py --all --matrix --scale-scan
  [ -s bench_matrix.jsonl ] && cp bench_matrix.jsonl artifacts/bench_matrix_r04.jsonl
  [ -s bench_details.json ] && cp bench_details.json artifacts/bench_all_r04.json
  publish "Re-run the full bench matrix on-chip (r04 stamp)"
fi
CKPT=runs/sino_radial_stem2_ext
for CHUNK in 1 2 3 4 5 6; do
  now=$(( $(date +%s) - START ))
  [ "$now" -ge "$DEADLINE" ] && break
  stage 1800 $PY train.py --preset sino_unet_radial --steps 34000 \
    --set train.eval_every=1000 --set train.ckpt_every=1000 \
    --ckpt-dir $CKPT --metrics $CKPT/metrics.jsonl
  stage 1500 $PY infer.py --preset sino_unet_radial --ckpt-dir $CKPT \
    --ckpt best --n-slices 64 \
    --json-out artifacts/sino_unet_radial_stem2_34k_test.json
  publish "sino_unet_radial stem-2 extension: chunk $CHUNK plateau measurement"
  tail -n 1 $CKPT/metrics.jsonl 2>/dev/null | grep -q '"step": 34000' && break
done
stage 3600 $PY scripts/ood_eval.py
publish "Fill remaining OOD cells"

echo "=== [$(date +%H:%M:%S)] s2c drained (t=$(( $(date +%s) - START ))s) ===" >&2
