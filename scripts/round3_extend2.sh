#!/usr/bin/env bash
# Round-3 late-session extensions: presets with measured headroom resume
# from their full-matrix checkpoints (runs/ from round3_full_matrix.sh).
# sino_unet_radial first (2.1 dB below its dense-data DCF ceiling), then
# the flagship (0.25 dB behind lpd at stem=2), then fan (val still
# climbing at 20k). Each preset re-infers and refreshes artifacts/.
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
    && cp "runs/${p}_test.json" "artifacts/${p}_test.json" \
    || echo "INFER FAILED: $p"
}

run sino_unet_radial 34000
run pdunet_parallel 36000
run pdunet_fan 30000
echo "=== [$(date +%H:%M:%S)] infer pdunet_fan under training corruption"
timeout 3600 python infer.py --preset pdunet_fan --ckpt-dir runs/pdunet_fan \
  --ckpt best --n-slices 64 --corrupt --json-out runs/pdunet_fan_test_corrupt.json \
  && cp runs/pdunet_fan_test_corrupt.json artifacts/pdunet_fan_test_corrupt.json \
  || echo "INFER(corrupt) FAILED: pdunet_fan"
run pdunet_radial 28000
echo "=== [$(date +%H:%M:%S)] round-3 extension-2 done"
for f in runs/*_test*.json; do echo "$f: $(cat "$f")"; done
