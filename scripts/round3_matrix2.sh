#!/usr/bin/env bash
# Round-3 follow-up matrix:
#  - radial presets retrain FRESH: the Voronoi-angle DCF changed their
#    reconstruction operator (ceiling +2.7 dB), old weights are mismatched
#  - scan-model presets resume their interrupted extensions (the remat-flip
#    restore shim un-strands the morning checkpoints)
set -u
cd "$(dirname "$0")/.."

fresh() { rm -rf "runs/$1" "runs/$1.jsonl"; }

declare -A STEPS=(
  [sino_unet_radial]=14000
  [pdunet_radial]=16000
  [pdunet_fan]=16000
  [pdunet_parallel]=24000
  [lpd_parallel]=10000
)
ORDER=(sino_unet_radial pdunet_radial pdunet_fan pdunet_parallel lpd_parallel)

fresh sino_unet_radial
fresh pdunet_radial

for p in "${ORDER[@]}"; do
  steps="${STEPS[$p]}"
  echo "=== [$(date +%H:%M:%S)] train $p -> $steps steps"
  timeout 14400 python train.py --preset "$p" --steps "$steps" \
    --ckpt-dir "runs/$p" --metrics "runs/$p.jsonl" --resume auto \
    || { echo "TRAIN FAILED: $p"; continue; }
  echo "=== [$(date +%H:%M:%S)] infer $p (best ckpt, noiseless)"
  timeout 3600 python infer.py --preset "$p" --ckpt-dir "runs/$p" --ckpt best \
    --n-slices 64 --json-out "runs/${p}_test.json" \
    || echo "INFER FAILED: $p"
  if [ "$p" = pdunet_fan ]; then
    echo "=== [$(date +%H:%M:%S)] infer $p under training corruption"
    timeout 3600 python infer.py --preset "$p" --ckpt-dir "runs/$p" --ckpt best \
      --n-slices 64 --corrupt --json-out "runs/${p}_test_corrupt.json" \
      || echo "INFER(corrupt) FAILED: $p"
  fi
done
echo "=== [$(date +%H:%M:%S)] round-3 follow-up matrix done"
for f in runs/*_test*.json; do echo "$f: $(cat "$f")"; done
