#!/bin/bash
# Round-5 noise-arm safety net — after the sweep-up. A no-op when the main
# queue already landed the SNR-30-trained radial arm (VERDICT r4 #3);
# otherwise trains + scores it here so the noise table cannot end the
# round half-empty.
#
#   nohup bash scripts/round5_noise.sh WAIT_PID > /tmp/round5_noise.log 2>&1 &
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

SETS="--set=geometry.sparsity=4 --set=train.batch_size=32 \
--set=train.learning_rate=0.001 --set=train.warmup_steps=150 \
--set=train.kspace_snr_db=30"
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage 2700 $PY train.py --preset pdunet_radial --steps 1500 $SETS \
    --set=train.eval_every=150 --set=train.ckpt_every=150 \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage 1800 $PY infer.py --preset pdunet_radial $SETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 \
    --json-out artifacts/noisy_radial_snr30_clean.json
  stage 1800 $PY infer.py --preset pdunet_radial $SETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
  $PY scripts/results_tables.py --update-readme >/dev/null || true
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet \
    || git commit -q -m "Train pdunet_radial at SNR 30 dB; land both noise-table arms"
fi
echo "=== [$(date +%H:%M:%S)] noise net done ===" >&2
