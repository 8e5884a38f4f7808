#!/bin/bash
# Round-5 TPU queue — drain the experiment matrix round 4 built
# (VERDICT r4 next-round items 1-3 + 6).
#
# Hardening vs round-4's queues (verdict weak #3):
#   * every train/infer subprocess runs with PDUNET_WATCHDOG_SECS: a wedged
#     axon compile RPC now costs <= WATCHDOG s (exit 87) instead of the
#     stage's whole timeout, and the stage retries once (training resumes
#     from the last orbax checkpoint),
#   * tables are regenerated AND committed after EVERY stage, so a killed
#     session publishes everything that landed,
#   * per-sparsity bench rows are written atomically (advisor r4: a >>
#     redirect used to create the guard file even on failure).
#
#   nohup bash scripts/round5_queue.sh > /tmp/round5_queue.log 2>&1 &
#   echo $! > /tmp/round5_queue.pid
set -u
cd "$(dirname "$0")/.."
PY=python
export PDUNET_WATCHDOG_SECS=${PDUNET_WATCHDOG_SECS:-600}
START=$(date +%s)
DEADLINE=${DEADLINE:-21600}

SWEEP_SETS="--set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150"

stage() {  # stage <timeout_s> <cmd...>: bounded, retry-once on wedge
  local t=$1; shift
  local now=$(( $(date +%s) - START ))
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "=== [$(date +%H:%M:%S)] deadline (${now}s): skipping: $*" >&2
    return 0
  fi
  echo "=== [$(date +%H:%M:%S)] stage (t=${now}s): $*" >&2
  timeout -k 30 "$t" "$@"
  local rc=$?
  if [ $rc -eq 87 ] || [ $rc -eq 124 ]; then
    echo "!!! wedged/timed out (rc=$rc), retrying once: $*" >&2
    timeout -k 30 "$t" "$@" \
      || echo "!!! retry failed (continuing): $*" >&2
  elif [ $rc -ne 0 ]; then
    echo "!!! stage failed rc=$rc (continuing): $*" >&2
  fi
  return 0
}

publish() {  # rebuild tables from ALL artifacts, commit what landed
  $PY scripts/acceleration_sweep.py --table-only >/dev/null || true
  $PY scripts/results_tables.py --update-readme >/dev/null || true
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet || git commit -q -m "$1"
}

# ---- 1. Classical no-learning anchors (no training; ~9 compiles) --------
if [ ! -f artifacts/classical_baselines.json ]; then
  stage 2400 $PY scripts/classical_baselines.py
  publish "Land classical FBP/DCF-adjoint anchor rows for the sweep table"
fi

# ---- 2. Per-sparsity flagship throughput rows (atomic, per-K guard) ------
for K in 2 8; do
  if ! grep -qs "\"sparsity\": $K" artifacts/bench_sparsity_rows.jsonl; then
    stage 1200 sh -c "$PY bench.py --preset-recon pdunet_parallel --batch 256 --sparsity $K > /tmp/bench_row_$K.json && tail -n 1 /tmp/bench_row_$K.json >> artifacts/bench_sparsity_rows.jsonl"
  fi
done
publish "Bench flagship recon throughput at 2x/8x sparsity"

# ---- 3. lpd s4 full-budget cell (resume from step-900 interim ckpt) ------
FORCE=
grep -qs interim artifacts/sweep/lpd_parallel_s4.json && FORCE=--force
if [ -n "$FORCE" ] || [ ! -f artifacts/sweep/lpd_parallel_s4.json ]; then
  stage 3000 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
    --sparsities 4 $FORCE
  # the r4 lpd OOD rows were scored with the interim half-budget ckpt:
  # re-score every kind with the full-budget one
  stage 2400 $PY scripts/ood_eval.py --presets lpd_parallel --force
  publish "Retrain lpd_parallel 4x at full matched budget; re-score its OOD rows"
fi

# ---- 4. Remaining sweep cells (radial 48k-sample budget, as r4) ----------
if [ ! -f artifacts/sweep/sino_unet_radial_s8.json ]; then
  # the r4 run died mid-train and only the best/ slot survives: no latest
  # ckpt to resume, so start the cell clean
  [ ! -d runs/sweep/sino_unet_radial_s8/0 ] && rm -rf runs/sweep/sino_unet_radial_s8
  stage 2400 $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
    --sparsities 8 --samples 48000
  publish "Land sino_unet_radial 8x sweep cell"
fi
stage 2400 $PY scripts/acceleration_sweep.py --presets pdunet_radial \
  --sparsities 2 --samples 48000
publish "Land pdunet_radial 2x sweep cell"
stage 2400 $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
  --sparsities 2 --samples 48000
publish "Land sino_unet_radial 2x sweep cell"
stage 3000 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
  --sparsities 8
publish "Land lpd_parallel 8x sweep cell"
stage 3000 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
  --sparsities 2
publish "Land lpd_parallel 2x sweep cell"

# ---- 5. OOD checkpoint retrains + full per-preset OOD re-score -----------
# r4 cleaned the runs/ checkpoints of the finished s4 cells, so the OOD
# kinds still missing (rectangles, smooth, hu_volume, fan/lpd shepp_logan)
# need the s4 checkpoints rebuilt. Same config+seed as the sweep cells ->
# statistically the same model; each preset's whole OOD row is then
# re-scored from ONE checkpoint (--force) for internal consistency.
ood_unlock() {  # ood_unlock <preset> <steps> <timeout>
  local P=$1 STEPS=$2 T=$3
  local EVERY=$(( STEPS / 10 ))
  local EXTRA=
  [ "${P#lpd}" != "$P" ] && EXTRA="--set=model.remat=true"
  if [ ! -d "runs/sweep/${P}_s4/best" ]; then
    stage "$T" $PY train.py --preset "$P" --steps "$STEPS" \
      --set=geometry.sparsity=4 $SWEEP_SETS $EXTRA \
      --set=train.eval_every=$EVERY --set=train.ckpt_every=$EVERY \
      --ckpt-dir "runs/sweep/${P}_s4" \
      --metrics "runs/sweep/${P}_s4/metrics.jsonl"
  fi
  stage 2400 $PY scripts/ood_eval.py --presets "$P" --force
  publish "Rebuild ${P} s4 checkpoint; score its full OOD row"
}
ood_unlock fbp_unet_parallel 3000 1800
ood_unlock pdunet_parallel 3000 2700
ood_unlock sino_unet_parallel 3000 1800
ood_unlock pdunet_fan 3000 2100
ood_unlock pdunet_radial 1500 2100
ood_unlock sino_unet_radial 1500 2100

# ---- 6. Noise-trained radial arm (train AT SNR 30, eval both ways) -------
NSETS="--set=geometry.sparsity=4 $SWEEP_SETS --set=train.kspace_snr_db=30"
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  EVERY=150
  stage 2400 $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --set=train.eval_every=$EVERY --set=train.ckpt_every=$EVERY \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage 1200 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --json-out artifacts/noisy_radial_snr30_clean.json
  stage 1200 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
  publish "Train pdunet_radial at SNR 30 dB; land both noise-table arms"
fi

# ---- 7. Any OOD cells still missing (cheap: skips existing) --------------
stage 3600 $PY scripts/ood_eval.py
publish "Fill remaining OOD cells"

# ---- 8. Full bench matrix re-run (r04 stamp; VERDICT weak #6) ------------
if [ ! -f artifacts/bench_matrix_r04.jsonl ]; then
  stage 4500 $PY bench.py --all --matrix --scale-scan
  [ -s bench_matrix.jsonl ] && cp bench_matrix.jsonl artifacts/bench_matrix_r04.jsonl
  [ -s bench_details.json ] && cp bench_details.json artifacts/bench_all_r04.json
  publish "Re-run the full bench matrix on-chip (r04 stamp)"
fi

echo "=== [$(date +%H:%M:%S)] round-5 queue drained (t=$(( $(date +%s) - START ))s) ===" >&2
