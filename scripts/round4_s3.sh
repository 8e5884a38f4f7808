#!/bin/bash
# Round-4 session-3 TPU queue (v2). The VM was reset again between
# sessions: artifacts survive in git, runs/ (checkpoints) is wiped.
# v1 learned two things: (a) lpd_parallel at batch 32 OOMs without remat
# (fixed in acceleration_sweep.py — auto model.remat=true for lpd cells),
# (b) the flagship s4 retrain (22 min) is poor value per TPU-minute next
# to the fbp retrain (8 min) for unlocking hu_volume OOD rows.
# Ordering by completed-table value per TPU-minute:
#   1. sino_unet_radial s8  — resumes the v1 run's checkpoints (~5 min),
#                             completes the radial 8x column,
#   2. lpd_parallel s4      — the LPD sweep row has zero cells; anchors the
#                             method ordering AND is the lpd OOD ckpt,
#   3. lpd OOD rows incl. the first hu_volume row,
#   4. per-sparsity bench throughput rows (cheap),
#   5. fbp s4 ckpt retrain (~8 min) → fbp hu_volume OOD row,
#   6. stretch: flagship retrain + hu row, lpd s8/s2, radial s2,
#   7. final table rebuild.
# A global deadline makes the queue surrender the TPU well before the
# driver's end-of-round bench; every stage skips work whose artifact
# already exists, so it is killable and resumable.
#
#   nohup bash scripts/round4_s3.sh > /tmp/round4_s3.log 2>&1 &
#   echo $! > /tmp/round4_s3.pid
set -u
cd "$(dirname "$0")/.."
PY=python
START=$(date +%s)
DEADLINE=${DEADLINE:-2100}   # seconds of queue budget (35 min default)
SWEEP_SETS="--set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150 --set=train.eval_every=300 --set=train.ckpt_every=300"

stage() {
  local now=$(( $(date +%s) - START ))
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "=== [$(date +%H:%M:%S)] deadline (${now}s): skipping: $* ===" >&2
    return 0
  fi
  echo "=== [$(date +%H:%M:%S)] stage (t=${now}s): $* ===" >&2
  timeout -k 30 $(( DEADLINE - now + 180 )) "$@" \
    || echo "!!! stage failed/timed out (continuing): $*" >&2
}

# 1. sino_unet_radial s8 — resume v1's partial run; completes radial 8x.
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
  --sparsities 8 --samples 48000

# 2. lpd_parallel s4 (auto-remat): sweep cell + OOD checkpoint.
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4

# 3. lpd OOD rows — including the first-ever hu_volume row.
stage $PY scripts/ood_eval.py --kinds hu_volume,shepp_logan,textured \
  --presets lpd_parallel

# 4. Per-sparsity throughput rows for the flagship (recon-only, ~3 min).
if [ ! -f artifacts/bench_sparsity_rows.jsonl ]; then
  for K in 2 8; do
    stage sh -c "$PY bench.py --preset-recon pdunet_parallel --batch 256 --sparsity $K >> artifacts/bench_sparsity_rows.jsonl"
  done
fi

# 5. fbp s4 ckpt retrain (cheapest hu_volume unlocker) + its OOD row.
if [ ! -d runs/sweep/fbp_unet_parallel_s4/best ]; then
  stage $PY train.py --preset fbp_unet_parallel --steps 3000 \
    --set=geometry.sparsity=4 $SWEEP_SETS \
    --ckpt-dir runs/sweep/fbp_unet_parallel_s4 \
    --metrics runs/sweep/fbp_unet_parallel_s4/metrics.jsonl
fi
stage $PY scripts/ood_eval.py --kinds hu_volume --presets fbp_unet_parallel

# 6. Stretch: flagship hu row, then remaining lpd + radial sweep cells.
if [ ! -d runs/sweep/pdunet_parallel_s4/best ]; then
  stage $PY train.py --preset pdunet_parallel --steps 3000 \
    --set=geometry.sparsity=4 $SWEEP_SETS \
    --ckpt-dir runs/sweep/pdunet_parallel_s4 \
    --metrics runs/sweep/pdunet_parallel_s4/metrics.jsonl
fi
stage $PY scripts/ood_eval.py --kinds hu_volume --presets pdunet_parallel
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 8
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 2
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial \
  --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
  --sparsities 2 --samples 48000

# 7. Rebuild the combined tables from whatever landed.
stage $PY scripts/acceleration_sweep.py --table-only

echo "=== [$(date +%H:%M:%S)] session-3 queue drained (t=$(( $(date +%s) - START ))s) ===" >&2
