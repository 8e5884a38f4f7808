#!/bin/bash
# Round-5 catch-all — last in the chain (queue → fixup → tail → this).
# Re-runs the sweep and OOD drivers with NO filters: completed cells skip
# on their artifacts, so only cells lost to double-wedges or deadline
# skips actually train/score. Then the final table rebuild + publish.
#
#   nohup bash scripts/round5_sweepup.sh WAIT_PID > /tmp/round5_sweepup.log 2>&1 &
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

publish() {
  $PY scripts/acceleration_sweep.py --table-only >/dev/null || true
  $PY scripts/results_tables.py --update-readme >/dev/null || true
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet || git commit -q -m "$1"
}

# radial cells use the 48k budget (see round5_queue.sh)
stage 7200 $PY scripts/acceleration_sweep.py \
  --presets pdunet_radial,sino_unet_radial --sparsities 2,8 --samples 48000
publish "Sweep-up: recover any radial sweep cells lost to wedges"
stage 7200 $PY scripts/acceleration_sweep.py \
  --presets pdunet_parallel,fbp_unet_parallel,sino_unet_parallel,lpd_parallel \
  --sparsities 2,4,8
publish "Sweep-up: recover any parallel sweep cells lost to wedges"
stage 7200 $PY scripts/ood_eval.py
publish "Sweep-up: fill any OOD cells still missing"

# bench matrix, in case the queue's deadline skipped it
if [ ! -f artifacts/bench_matrix_r04.jsonl ]; then
  stage 4500 $PY bench.py --all --matrix --scale-scan
  [ -s bench_matrix.jsonl ] && cp bench_matrix.jsonl artifacts/bench_matrix_r04.jsonl
  [ -s bench_details.json ] && cp bench_details.json artifacts/bench_all_r04.json
  publish "Re-run the full bench matrix on-chip (r04 stamp)"
fi

echo "=== [$(date +%H:%M:%S)] sweep-up drained ===" >&2
