#!/bin/bash
# Round-5 last-lap fixup. The s2c kill left EMPTY best/ dirs for
# pdunet_radial_s4 and fbp_unet_parallel_s4, which s2d's `[ ! -d best ]`
# guard mistook for finished checkpoints (its ood_eval stages then failed
# on the empty slot). Correct guard: best.json, written only after a real
# best-val save. Radial first (verdict-named 11.3 dB shepp gap + its
# missing rectangles/smooth cells + probe), then the resumable
# sino_unet_radial unlock, then fbp, then the fan hu_volume backfill.
#
#   nohup bash scripts/round5_s2e.sh > /tmp/round5_s2e.log 2>&1 &
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

unlock() {  # unlock <preset> <steps> <timeout>
  local P=$1 STEPS=$2 T=$3
  local EVERY=$(( STEPS / 10 ))
  local DIR="runs/sweep/${P}_s4"
  # an empty best/ dir from a killed run would make train.py's resume
  # path and ood_eval fail — clear it; then ALWAYS train: it resumes a
  # genuine checkpoint toward the target step and exits immediately when
  # already there (loop.py trains range(start_step, n_steps)). A
  # best.json/dir-existence skip guard mistakes partial runs for done
  # (that bug cost this session the radial row once already).
  [ -d "$DIR/best" ] && [ ! -f "$DIR/best.json" ] && rm -rf "$DIR/best"
  stage "$T" $PY train.py --preset "$P" --steps "$STEPS" \
    --set=geometry.sparsity=4 $SWEEP_SETS \
    --set=train.eval_every=$EVERY --set=train.ckpt_every=$EVERY \
    --ckpt-dir "$DIR" --metrics "$DIR/metrics.jsonl"
  stage 3000 $PY scripts/ood_eval.py --presets "$P" --force
  publish "Rebuild ${P} s4 checkpoint; score its full OOD row"
}

# ---- 1. pdunet_radial fixup + probe --------------------------------------
unlock pdunet_radial 1500 2400
stage 2400 $PY scripts/ood_analysis.py --presets pdunet_radial \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
publish "OOD gap attribution: pdunet_radial shepp_logan probe"

# ---- 2. sino_unet_radial unlock (resumes the killed train) ---------------
unlock sino_unet_radial 1500 2700

# ---- 3. fbp fixup --------------------------------------------------------
unlock fbp_unet_parallel 3000 1800

# ---- 4. fan hu_volume backfill (its infer wedged out in s2c) -------------
stage 1800 $PY scripts/ood_eval.py --presets pdunet_fan
publish "Backfill the pdunet_fan hu_volume cell"

# ---- 5. Full-table analysis if time remains ------------------------------
stage 3600 $PY scripts/ood_analysis.py
publish "OOD gap attribution: anchor + DC-residual cells for the full table"

echo "=== [$(date +%H:%M:%S)] s2e drained (t=$(( $(date +%s) - START ))s) ===" >&2
