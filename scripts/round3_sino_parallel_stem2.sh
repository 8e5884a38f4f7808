#!/usr/bin/env bash
# Same measured A/B as sino_unet_radial (which shipped stem=2 after losing
# only 0.7 dB for 1.34x throughput): sino_unet_parallel's UNet runs stem-1
# on the 360x363 CT sinogram. The task is also operator-ceiling-limited
# (FBP of the TRUE dense sinogram scores 41.45 dB; the stem-1 net reaches
# 41.93), so capacity is not the binding constraint. Preset flips only if
# the 64-slice table holds near the ceiling.
set -u
cd "$(dirname "$0")/.."

echo "=== [$(date +%H:%M:%S)] train sino_unet_parallel stem=2 -> 16000 steps"
timeout 10800 python train.py --preset sino_unet_parallel --steps 16000 \
  --ckpt-dir runs/sino_unet_parallel_s2 --metrics runs/sino_unet_parallel_s2.jsonl \
  --resume auto --set model.stem=2 \
  || { echo "TRAIN FAILED"; exit 1; }

echo "=== [$(date +%H:%M:%S)] infer (best ckpt, 64 slices)"
timeout 3600 python infer.py --preset sino_unet_parallel \
  --ckpt-dir runs/sino_unet_parallel_s2 --ckpt best --n-slices 64 \
  --set model.stem=2 --json-out runs/sino_unet_parallel_s2_test.json \
  || { echo "INFER FAILED"; exit 1; }
cat runs/sino_unet_parallel_s2_test.json

echo "=== [$(date +%H:%M:%S)] bench the stem=2 recon row"
timeout 1800 python bench.py --preset-recon sino_unet_parallel --batch 128 --stem 2
echo "=== [$(date +%H:%M:%S)] done"
