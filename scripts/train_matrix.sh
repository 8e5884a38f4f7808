#!/usr/bin/env bash
# Train the full experiment matrix sequentially on the TPU (single-client
# chip: never run two device processes at once) and evaluate each preset.
# Usage: bash scripts/train_matrix.sh [preset ...]   (default: all seven)
set -u
cd "$(dirname "$0")/.."

PRESETS=("$@")
if [ ${#PRESETS[@]} -eq 0 ]; then
  PRESETS=(pdunet_radial pdunet_parallel sino_unet_radial pdunet_fan
           sino_unet_parallel lpd_parallel fbp_unet_parallel)
fi

# Direct-to-final budgets: resuming with a larger --steps recompiles the
# whole train step (LR-schedule constants are baked into the jaxpr), so
# train the target budget in one go rather than extend.
declare -A STEPS=(
  [pdunet_parallel]=16000
  [fbp_unet_parallel]=8000
  [sino_unet_parallel]=10000
  [sino_unet_radial]=12000
  [pdunet_fan]=10000
  [pdunet_radial]=12000
  [lpd_parallel]=8000
)

mkdir -p runs
for p in "${PRESETS[@]}"; do
  steps="${STEPS[$p]:-5000}"
  echo "=== [$(date +%H:%M:%S)] train $p ($steps steps)"
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
echo "=== [$(date +%H:%M:%S)] matrix done"
for f in runs/*_test*.json; do echo "$f: $(cat "$f")"; done
