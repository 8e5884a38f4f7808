#!/usr/bin/env bash
# Round-3 final extension: lpd was still gaining ~0.07 dB/1k at its 20k
# budget; the stem-1 flagship ~0.04 dB/1k at 36k. Extend both with the
# remaining round budget (the doubling-trig kernels also make each step
# cheaper than when those budgets were set).
set -u
cd "$(dirname "$0")/.."
run() {
  local p="$1" steps="$2" tmo="$3"; shift 3
  echo "=== [$(date +%H:%M:%S)] train $p -> $steps steps"
  timeout "$tmo" python train.py --preset "${p%%_hq}" --steps "$steps" \
    --ckpt-dir "runs/$p" --metrics "runs/$p.jsonl" --resume auto "$@" \
    || { echo "TRAIN FAILED: $p"; return 1; }
  echo "=== [$(date +%H:%M:%S)] infer $p (best ckpt, noiseless)"
  timeout 1800 python infer.py --preset "${p%%_hq}" --ckpt-dir "runs/$p" \
    --ckpt best --n-slices 64 --json-out "runs/${p}_test.json" "$@" \
    || echo "INFER FAILED: $p"
}
run lpd_parallel 30000 2400
cp runs/lpd_parallel_test.json artifacts/lpd_parallel_test.json
run pdunet_parallel_hq 46000 3000 --set model.stem=1
cp runs/pdunet_parallel_hq_test.json artifacts/pdunet_parallel_stem1_test.json
echo "=== [$(date +%H:%M:%S)] round-3 extension-4 done"
