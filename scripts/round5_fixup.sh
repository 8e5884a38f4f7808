#!/bin/bash
# Round-5 fixup — runs after round5_queue.sh, before round5_tail.sh.
#
# The lpd s4 full-budget retrain wedged mid-run (axon RPC): the watchdog's
# exit 87 surfaced as CalledProcessError → sweep exit 1, which the queue's
# 87-only retry did not catch, so the cell is still the interim artifact
# and its OOD rows were re-scored against a partially-trained best slot.
# acceleration_sweep.run() now retries child exit 87 in place; this script
# finishes the lpd cell (resume from the post-wedge checkpoint), re-scores
# its OOD row with the full-budget weights, publishes, then hands the TPU
# to round5_tail.sh.
#
#   nohup bash scripts/round5_fixup.sh WAIT_PID > /tmp/round5_fixup.log 2>&1 &
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
  if [ $rc -ne 0 ]; then
    echo "!!! stage rc=$rc, retrying once: $*" >&2
    timeout -k 30 "$t" "$@" || echo "!!! retry failed (continuing): $*" >&2
  fi
  return 0
}

if grep -qs interim artifacts/sweep/lpd_parallel_s4.json; then
  stage 3000 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
    --sparsities 4 --force
  stage 2400 $PY scripts/ood_eval.py --presets lpd_parallel --force
  $PY scripts/acceleration_sweep.py --table-only >/dev/null || true
  $PY scripts/results_tables.py --update-readme >/dev/null || true
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet \
    || git commit -q -m "Finish the lpd_parallel 4x full-budget cell lost to a mid-run wedge; re-score its OOD row"
fi

exec bash scripts/round5_tail.sh
