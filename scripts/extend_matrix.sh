#!/usr/bin/env bash
# Second-pass quality extension: resume each trained preset to a larger
# step budget and re-evaluate. Run on the TPU after scripts/train_matrix.sh.
# NOTE: changing --steps on resume recompiles the whole train step (the LR
# schedule is baked into the jaxpr) — budget ~10-20 min extra per preset.
set -u
cd "$(dirname "$0")/.."

declare -A STEPS=(
  [pdunet_parallel]=24000
  [fbp_unet_parallel]=12000
  [sino_unet_parallel]=16000
  [sino_unet_radial]=18000
  [pdunet_fan]=16000
  [pdunet_radial]=18000
  [lpd_parallel]=12000
)

PRESETS=("$@")
if [ ${#PRESETS[@]} -eq 0 ]; then PRESETS=("${!STEPS[@]}"); fi

for p in "${PRESETS[@]}"; do
  echo "=== [$(date +%H:%M:%S)] extend $p -> ${STEPS[$p]} steps"
  timeout 14400 python train.py --preset "$p" --steps "${STEPS[$p]}" \
    --ckpt-dir "runs/$p" --metrics "runs/$p.jsonl" --resume auto \
    || { echo "EXTEND FAILED: $p"; continue; }
  timeout 3600 python infer.py --preset "$p" --ckpt-dir "runs/$p" --ckpt best \
    --n-slices 64 --json-out "runs/${p}_test.json" \
    || echo "INFER FAILED: $p"
  if [ "$p" = pdunet_fan ]; then
    timeout 3600 python infer.py --preset "$p" --ckpt-dir "runs/$p" --ckpt best \
      --n-slices 64 --corrupt --json-out "runs/${p}_test_corrupt.json" \
      || echo "INFER(corrupt) FAILED: $p"
  fi
done
echo "=== [$(date +%H:%M:%S)] extension done"
for f in runs/*_test*.json; do echo "$f: $(cat "$f")"; done
