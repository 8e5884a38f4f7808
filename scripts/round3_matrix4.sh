#!/usr/bin/env bash
# Round-3 f32-synthesis extensions: measurement synthesis + f0/direct-recon
# moved to f32 (bf16 synthesis baked ~1e-2 rounding into the simulated
# data, capping the radial sino task at 47.70 dB vs 49.33 with f32 synth).
# Every preset resumes from its current checkpoint and adapts to the
# cleaner data distribution; fresh 64-slice infers refresh the tables.
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

run sino_unet_radial 20000
run pdunet_radial 20000
run pdunet_parallel 28000
run pdunet_fan 20000
echo "=== [$(date +%H:%M:%S)] infer pdunet_fan under training corruption"
timeout 3600 python infer.py --preset pdunet_fan --ckpt-dir runs/pdunet_fan \
  --ckpt best --n-slices 64 --corrupt --json-out runs/pdunet_fan_test_corrupt.json \
  || echo "INFER(corrupt) FAILED: pdunet_fan"
run sino_unet_parallel 16000
run lpd_parallel 13000
run fbp_unet_parallel 17000
run pdunet_parallel_hq 24000 --set model.stem=1
echo "=== [$(date +%H:%M:%S)] round-3 f32-synth extension matrix done"
for f in runs/*_test*.json; do echo "$f: $(cat "$f")"; done
