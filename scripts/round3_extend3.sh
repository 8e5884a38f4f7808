#!/usr/bin/env bash
# Final round-3 quality pass: the stem-1 flagship was still gaining
# ~0.04 dB/1k steps at its 24k budget; lpd gets a matching extension.
set -u
cd "$(dirname "$0")/.."
run() {
  local p="$1" steps="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] train $p -> $steps steps"
  timeout 14400 python train.py --preset "${p%%_hq}" --steps "$steps" \
    --ckpt-dir "runs/$p" --metrics "runs/$p.jsonl" --resume auto "$@" \
    || { echo "TRAIN FAILED: $p"; return 1; }
  echo "=== [$(date +%H:%M:%S)] infer $p (best ckpt, noiseless)"
  timeout 3600 python infer.py --preset "${p%%_hq}" --ckpt-dir "runs/$p" \
    --ckpt best --n-slices 64 --json-out "runs/${p}_test.json" "$@" \
    || echo "INFER FAILED: $p"
}
run pdunet_parallel_hq 36000 --set model.stem=1
cp runs/pdunet_parallel_hq_test.json artifacts/pdunet_parallel_stem1_test.json
run lpd_parallel 20000
cp runs/lpd_parallel_test.json artifacts/lpd_parallel_test.json
echo "=== [$(date +%H:%M:%S)] round-3 extension-3 done"
