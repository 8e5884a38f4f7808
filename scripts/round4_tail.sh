#!/bin/bash
# Round-4 TPU queue tail — takes over from round4_queue3.sh once its
# cheap stages (1-6) have drained. Reordering vs queue3's stages 7-8:
# one lpd_parallel s4 cell and one pdunet_fan s4 cell come FIRST —
# each is a single ~18-min cell that unlocks an entire OOD-table row
# (ood_eval scores runs/sweep/<preset>_s4 checkpoints) plus the
# matched-budget 4x sweep point — then the radial 8x/2x acceleration
# cells, then the remaining LPD factors. Every stage is individually
# resumable (artifact-exists skip + train.py checkpoint auto-resume),
# so killing this script at the wall-clock cutoff loses at most ~300
# training steps of the in-flight cell.
#
#   nohup bash scripts/round4_tail.sh [WAIT_PID] > /tmp/round4_tail.log 2>&1 &
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

# 1. One-cell OOD-row unlockers: lpd (4th CT method at matched budget)
#    and fan (3rd geometry).
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4
stage $PY scripts/acceleration_sweep.py --presets pdunet_fan --sparsities 4

# 2. OOD rows for whatever stage 1 produced (existing cells skip).
stage $PY scripts/ood_eval.py

# 3. Radial acceleration cells — the paper's title axis for its second
#    modality; 8x (the harder, more interesting factor) before 2x.
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 8 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 8 --samples 48000
stage $PY scripts/acceleration_sweep.py --table-only
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial --sparsities 2 --samples 48000

# 4. LPD completes the CT acceleration axis.
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 8,2

# 5. Rebuild the combined table strictly from existing cells.
stage $PY scripts/acceleration_sweep.py --table-only

echo "=== [$(date +%H:%M:%S)] tail drained ===" >&2
