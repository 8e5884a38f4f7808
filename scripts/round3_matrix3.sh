#!/usr/bin/env bash
# Round-3 radial refresh: the Pipe-Menon DCF changed both radial presets'
# reconstruction operator (dense ceiling 46.13 → 49.33 dB / SSIM 0.904 →
# 0.984; sparse f0 recon 35.50 → 38.42 dB), so old weights are mismatched
# and both retrain FRESH against the better operator.
set -u
cd "$(dirname "$0")/.."

fresh() { rm -rf "runs/$1" "runs/$1.jsonl"; }

declare -A STEPS=(
  [sino_unet_radial]=14000
  [pdunet_radial]=16000
)
ORDER=(sino_unet_radial pdunet_radial)

for p in "${ORDER[@]}"; do
  fresh "$p"
  steps="${STEPS[$p]}"
  echo "=== [$(date +%H:%M:%S)] train $p -> $steps steps"
  timeout 14400 python train.py --preset "$p" --steps "$steps" \
    --ckpt-dir "runs/$p" --metrics "runs/$p.jsonl" --resume auto \
    || { echo "TRAIN FAILED: $p"; continue; }
  echo "=== [$(date +%H:%M:%S)] infer $p (best ckpt, noiseless)"
  timeout 3600 python infer.py --preset "$p" --ckpt-dir "runs/$p" --ckpt best \
    --n-slices 64 --json-out "runs/${p}_test.json" \
    || echo "INFER FAILED: $p"
done
echo "=== [$(date +%H:%M:%S)] round-3 radial refresh done"
for p in "${ORDER[@]}"; do echo "runs/${p}_test.json: $(cat "runs/${p}_test.json")"; done
