#!/usr/bin/env bash
# Round-3 (continued session) full from-scratch matrix: runs/ does not
# survive round boundaries, so every preset retrains at the current code
# state (f32 measurement synthesis, Pipe-Menon/Voronoi DCF, hard data
# consistency in the sino tasks, spoke wrap-parity fix). Step budgets are
# the cumulative targets the interrupted round3_matrix4.sh was heading to.
# Flagship presets run first so an interruption still leaves the headline
# numbers fresh. After each preset, the 64-slice test table is copied into
# artifacts/ so partial progress is committable.
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

run pdunet_parallel 28000
run pdunet_radial 20000
run sino_unet_radial 20000
run pdunet_fan 20000
echo "=== [$(date +%H:%M:%S)] infer pdunet_fan under training corruption"
timeout 3600 python infer.py --preset pdunet_fan --ckpt-dir runs/pdunet_fan \
  --ckpt best --n-slices 64 --corrupt --json-out runs/pdunet_fan_test_corrupt.json \
  && cp runs/pdunet_fan_test_corrupt.json artifacts/pdunet_fan_test_corrupt.json \
  || echo "INFER(corrupt) FAILED: pdunet_fan"
run sino_unet_parallel 16000
run lpd_parallel 13000
run fbp_unet_parallel 17000
run pdunet_parallel_hq 24000 --set model.stem=1
cp runs/pdunet_parallel_hq_test.json artifacts/pdunet_parallel_stem1_test.json 2>/dev/null
echo "=== [$(date +%H:%M:%S)] round-3 full matrix done"
for f in runs/*_test*.json; do echo "$f: $(cat "$f")"; done
