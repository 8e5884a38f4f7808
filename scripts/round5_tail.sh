#!/bin/bash
# Round-5 tail — takes the TPU after round5_queue.sh drains:
#   1. OOD gap attribution (scripts/ood_analysis.py): amplitude probes on
#      the three documented >3 dB gaps, then anchor+residual+worst-PNG
#      cells for the whole (preset x kind) table (VERDICT r4 #2's
#      "write the investigation").
#   2. sino_unet_radial stem-2 extended training to 34k steps (VERDICT r4
#      #5: stem-1 kept improving to 34k; the shipped stem-2 config only
#      ever saw 20k). Resume-safe: a wall-clock kill loses nothing — the
#      best-val slot is scored wherever training got to.
#
#   nohup bash scripts/round5_tail.sh [WAIT_PID] > /tmp/round5_tail.log 2>&1 &
#   echo $! > /tmp/round5_tail.pid
set -u
cd "$(dirname "$0")/.."
PY=python
export PDUNET_WATCHDOG_SECS=${PDUNET_WATCHDOG_SECS:-600}

if [ $# -ge 1 ] && [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 to release the TPU ===" >&2
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

stage() {
  local t=$1; shift
  echo "=== [$(date +%H:%M:%S)] stage: $*" >&2
  timeout -k 30 "$t" "$@"
  local rc=$?
  if [ $rc -eq 87 ] || [ $rc -eq 124 ]; then
    echo "!!! wedged/timed out (rc=$rc), retrying once: $*" >&2
    timeout -k 30 "$t" "$@" || echo "!!! retry failed (continuing): $*" >&2
  elif [ $rc -ne 0 ]; then
    echo "!!! stage failed rc=$rc (continuing): $*" >&2
  fi
  return 0
}

publish() {
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet || git commit -q -m "$1"
}

# ---- 1a. Amplitude probes on the documented gaps -------------------------
stage 3600 $PY scripts/ood_analysis.py --presets lpd_parallel \
  --kinds indist,hu_volume,textured --amplitudes 0.25,0.5,1.0
stage 3600 $PY scripts/ood_analysis.py --presets sino_unet_parallel \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
stage 3600 $PY scripts/ood_analysis.py --presets pdunet_radial \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
publish "OOD gap attribution: amplitude probes + anchors for the three >3 dB gaps"

# ---- 1b. Anchor/residual cells for the rest of the table -----------------
stage 7200 $PY scripts/ood_analysis.py
publish "OOD gap attribution: anchor + DC-residual cells for the full table"

# ---- 2. stem-2 extended training (the 34k-step plateau question) ---------
CKPT=runs/sino_radial_stem2_ext
stage 21600 $PY train.py --preset sino_unet_radial --steps 34000 \
  --set train.eval_every=1000 --set train.ckpt_every=1000 \
  --ckpt-dir $CKPT --metrics $CKPT/metrics.jsonl
stage 2400 $PY infer.py --preset sino_unet_radial --ckpt-dir $CKPT \
  --ckpt best --n-slices 64 \
  --json-out artifacts/sino_unet_radial_stem2_34k_test.json
publish "sino_unet_radial stem-2 extended to 34k steps: plateau measurement"

echo "=== [$(date +%H:%M:%S)] round-5 tail drained ===" >&2
