#!/usr/bin/env bash
# sino_unet_radial is the slowest matrix row (195 slices/s/chip) and 65% of
# its recon time is the stem-1 UNet on the 512x512x2 complex spoke sinogram
# (measured on-chip; see VERDICT_R2_RESPONSES.md). The task is operator-
# ceiling-limited (dense-spoke Voronoi-DCF adjoint ~46 dB), not capacity-
# limited, so a stem=2 net (4x fewer conv pixels, same bottleneck recipe as
# the flagship's 1074->1365 jump) should keep quality at the ceiling while
# roughly doubling throughput. This script trains the A/B candidate; the
# preset is only flipped to stem=2 if the 64-slice table holds up.
set -u
cd "$(dirname "$0")/.."

echo "=== [$(date +%H:%M:%S)] train sino_unet_radial stem=2 -> 20000 steps"
timeout 10800 python train.py --preset sino_unet_radial --steps 20000 \
  --ckpt-dir runs/sino_unet_radial_s2 --metrics runs/sino_unet_radial_s2.jsonl \
  --resume auto --set model.stem=2 \
  || { echo "TRAIN FAILED"; exit 1; }

echo "=== [$(date +%H:%M:%S)] infer (best ckpt, 64 slices)"
timeout 3600 python infer.py --preset sino_unet_radial \
  --ckpt-dir runs/sino_unet_radial_s2 --ckpt best --n-slices 64 \
  --set model.stem=2 --json-out runs/sino_unet_radial_s2_test.json \
  || { echo "INFER FAILED"; exit 1; }
cat runs/sino_unet_radial_s2_test.json

echo "=== [$(date +%H:%M:%S)] bench the stem=2 recon row"
timeout 1800 python bench.py --preset-recon sino_unet_radial --batch 32 --stem 2
echo "=== [$(date +%H:%M:%S)] done"
