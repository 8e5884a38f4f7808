#!/bin/bash
# Round-4 session-4 TPU queue — everything session 3 could not fit.
# Session-3 learnings baked in:
#   * lpd cells need model.remat=true at batch 32 (acceleration_sweep.py
#     now applies it automatically) and run ~2 steps/s — budget ~30 min.
#   * The axon compile RPC can wedge indefinitely (train sleeps at ~0% CPU
#     with no metrics.jsonl progress): each stage here is under `timeout`,
#     and a wedged cell is safe to re-run — training resumes from the last
#     orbax checkpoint.
# Ordering by completed-table value per TPU-minute:
#   1. finish lpd s4 (resume) if session 3's manual infer didn't land it,
#   2. lpd OOD priority kinds (first hu_volume row) if missing,
#   3. sino_unet_radial s8 (lost to a wedged RPC in session 3),
#   4. per-sparsity bench rows (cheap),
#   5. fbp s4 ckpt retrain -> fbp hu_volume OOD row,
#   6. pdunet_parallel s4 ckpt retrain -> flagship hu_volume OOD row,
#   7. classical_baselines (non-learned anchor rows; cheap, no training),
#   8. radial s2 cells, lpd s8/s2,
#   9. noise-trained radial arm (VERDICT #5 remainder),
#  10. remaining OOD kinds (rectangles, smooth) for live ckpts,
#  11. final table rebuild (also run scripts/results_tables.py
#      --update-readme afterwards and commit).
#
#   nohup bash scripts/round4_s4.sh > /tmp/round4_s4.log 2>&1 &
#   echo $! > /tmp/round4_s4.pid
set -u
cd "$(dirname "$0")/.."
PY=python
START=$(date +%s)
DEADLINE=${DEADLINE:-2700}
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

# 1./2. lpd s4 + OOD rows (skipped automatically if already landed).
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 4
stage $PY scripts/ood_eval.py --kinds hu_volume,shepp_logan,textured \
  --presets lpd_parallel

# 3. sino_unet_radial s8 — completes the radial 8x column.
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
  --sparsities 8 --samples 48000

# 4. Per-sparsity throughput rows for the flagship (recon-only, ~3 min).
if [ ! -f artifacts/bench_sparsity_rows.jsonl ]; then
  for K in 2 8; do
    stage sh -c "$PY bench.py --preset-recon pdunet_parallel --batch 256 --sparsity $K >> artifacts/bench_sparsity_rows.jsonl"
  done
fi

# 5./6. hu_volume OOD unlockers, cheapest first.
for P in fbp_unet_parallel pdunet_parallel; do
  if [ ! -d "runs/sweep/${P}_s4/best" ]; then
    stage $PY train.py --preset "$P" --steps 3000 \
      --set=geometry.sparsity=4 $SWEEP_SETS \
      --ckpt-dir "runs/sweep/${P}_s4" \
      --metrics "runs/sweep/${P}_s4/metrics.jsonl"
  fi
  stage $PY scripts/ood_eval.py --kinds hu_volume --presets "$P"
done

# 7. Classical anchors (no training; ~9 compiles).
if [ ! -f artifacts/classical_baselines.json ]; then
  stage $PY scripts/classical_baselines.py
fi

# 8. Remaining sweep cells.
stage $PY scripts/acceleration_sweep.py --presets pdunet_radial \
  --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
  --sparsities 2 --samples 48000
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 8
stage $PY scripts/acceleration_sweep.py --presets lpd_parallel --sparsities 2

# 9. Noise-trained radial arm (VERDICT #5 remainder).
NSETS="--set=geometry.sparsity=4 $SWEEP_SETS --set=train.kspace_snr_db=30"
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --json-out artifacts/noisy_radial_snr30_clean.json
  stage $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
fi

# 10. Remaining OOD kinds for whatever checkpoints are alive.
stage $PY scripts/ood_eval.py

# 11. Table rebuild.
stage $PY scripts/acceleration_sweep.py --table-only

echo "=== [$(date +%H:%M:%S)] session-4 queue drained (t=$(( $(date +%s) - START ))s) ===" >&2
