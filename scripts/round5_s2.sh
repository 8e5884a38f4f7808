#!/bin/bash
# Round-5 session-2 queue — fresh box (runs/ and .jax_cache lost), so every
# checkpoint the OOD/analysis stages need is rebuilt here. Value-ordered
# per VERDICT r4: (1) finish the sweep matrix, (2) complete + analyze the
# OOD table, (3) noise-trained arm, (6) bench matrix re-stamp, (5) stem-2
# plateau. Same hardening as round5_queue.sh: per-stage timeout, watchdog
# (exit 87) retry, publish-and-commit after every stage.
#
#   nohup bash scripts/round5_s2.sh > /tmp/round5_s2.log 2>&1 &
#   echo $! > /tmp/round5_s2.pid
set -u
cd "$(dirname "$0")/.."
PY=python
export PDUNET_WATCHDOG_SECS=${PDUNET_WATCHDOG_SECS:-600}
START=$(date +%s)
DEADLINE=${DEADLINE:-23400}   # 6.5 h of TPU; the tail stages self-skip past it

SWEEP_SETS="--set=train.batch_size=32 --set=train.learning_rate=0.001 --set=train.warmup_steps=150"

stage() {  # stage <timeout_s> <cmd...>: bounded, retry-once on wedge/timeout
  local t=$1; shift
  local now=$(( $(date +%s) - START ))
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "=== [$(date +%H:%M:%S)] deadline (${now}s): skipping: $*" >&2
    return 0
  fi
  echo "=== [$(date +%H:%M:%S)] stage (t=${now}s): $*" >&2
  timeout -k 30 "$t" "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "!!! stage rc=$rc, retrying once: $*" >&2
    timeout -k 30 "$t" "$@" || echo "!!! retry failed (continuing): $*" >&2
  fi
  return 0
}

publish() {  # rebuild tables from ALL artifacts, commit what landed
  $PY scripts/acceleration_sweep.py --table-only >/dev/null || true
  $PY scripts/results_tables.py --update-readme >/dev/null || true
  git add artifacts README.md >/dev/null 2>&1 || true
  git diff --cached --quiet || git commit -q -m "$1"
}

# ---- A. lpd s4 full-budget cell (the committed artifact is still the
#         900/3000-step interim; r4 advisor medium finding) ---------------
if grep -qs interim artifacts/sweep/lpd_parallel_s4.json; then
  stage 3600 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
    --sparsities 4 --force
  stage 3600 $PY scripts/ood_eval.py --presets lpd_parallel --force
  publish "Retrain lpd_parallel 4x at full matched budget; re-score its OOD row"
fi

# ---- B. Remaining sweep cells (driver skips cells whose artifact exists;
#         radial cells use the r4 48k-sample budget) ----------------------
stage 2700 $PY scripts/acceleration_sweep.py --presets pdunet_radial \
  --sparsities 2 --samples 48000
publish "Land pdunet_radial 2x sweep cell"
stage 3600 $PY scripts/acceleration_sweep.py --presets sino_unet_radial \
  --sparsities 2 --samples 48000
publish "Land sino_unet_radial 2x sweep cell"
stage 3600 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
  --sparsities 8
publish "Land lpd_parallel 8x sweep cell"
stage 3600 $PY scripts/acceleration_sweep.py --presets lpd_parallel \
  --sparsities 2
publish "Land lpd_parallel 2x sweep cell"

# ---- C. OOD checkpoint rebuilds + full per-preset OOD rows ---------------
# The fresh box has no runs/: rebuild each preset's s4 checkpoint with the
# sweep cell's exact config+seed, then score its FULL OOD row from that one
# checkpoint (--force) so every kind is internally consistent.
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
  stage 3000 $PY scripts/ood_eval.py --presets "$P" --force
  publish "Rebuild ${P} s4 checkpoint; score its full OOD row"
}
ood_unlock fbp_unet_parallel 3000 1800
ood_unlock sino_unet_parallel 3000 2100
ood_unlock pdunet_parallel 3000 2700
ood_unlock pdunet_fan 3000 2400
ood_unlock pdunet_radial 1500 2400
ood_unlock sino_unet_radial 1500 2700

# ---- D. OOD gap attribution: amplitude probes on the documented >3 dB
#         gaps (needs the stage-A/C checkpoints) --------------------------
stage 3600 $PY scripts/ood_analysis.py --presets lpd_parallel \
  --kinds indist,hu_volume,textured --amplitudes 0.25,0.5,1.0
stage 3600 $PY scripts/ood_analysis.py --presets sino_unet_parallel \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
stage 3600 $PY scripts/ood_analysis.py --presets pdunet_radial \
  --kinds indist,shepp_logan --amplitudes 0.5,1.0,2.0
publish "OOD gap attribution: amplitude probes + anchors for the three >3 dB gaps"

# ---- E. Noise-trained radial arm (train AT SNR 30, eval both ways) -------
NSETS="--set=geometry.sparsity=4 $SWEEP_SETS --set=train.kspace_snr_db=30"
NOISY=runs/noisy/pdunet_radial_snr30
if [ ! -f artifacts/noisy_radial_snr30_noisy.json ]; then
  stage 2700 $PY train.py --preset pdunet_radial --steps 1500 $NSETS \
    --set=train.eval_every=150 --set=train.ckpt_every=150 \
    --ckpt-dir $NOISY --metrics $NOISY/metrics.jsonl
  stage 1800 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 \
    --json-out artifacts/noisy_radial_snr30_clean.json
  stage 1800 $PY infer.py --preset pdunet_radial $NSETS --ckpt-dir $NOISY \
    --ckpt best --n-slices 64 --batch 32 --corrupt \
    --json-out artifacts/noisy_radial_snr30_noisy.json
  publish "Train pdunet_radial at SNR 30 dB; land both noise-table arms"
fi

# ---- F. Full bench matrix re-run (r04 stamp; VERDICT weak #6) ------------
if [ ! -f artifacts/bench_matrix_r04.jsonl ]; then
  stage 4800 $PY bench.py --all --matrix --scale-scan
  [ -s bench_matrix.jsonl ] && cp bench_matrix.jsonl artifacts/bench_matrix_r04.jsonl
  [ -s bench_details.json ] && cp bench_details.json artifacts/bench_all_r04.json
  publish "Re-run the full bench matrix on-chip (r04 stamp)"
fi

# ---- G. OOD analysis: anchor + DC-residual cells for the whole table -----
stage 7200 $PY scripts/ood_analysis.py
publish "OOD gap attribution: anchor + DC-residual cells for the full table"

# ---- H. stem-2 extended training, CHUNKED: train toward 34k in bounded
#         slices, score + publish the best-val slot after every chunk so a
#         wall-clock kill still lands the plateau measurement wherever
#         training got to (train.py auto-resumes from latest) -------------
CKPT=runs/sino_radial_stem2_ext
for CHUNK in 1 2 3 4 5 6 7 8 9 10; do
  now=$(( $(date +%s) - START ))
  [ "$now" -ge "$DEADLINE" ] && break
  stage 1800 $PY train.py --preset sino_unet_radial --steps 34000 \
    --set train.eval_every=1000 --set train.ckpt_every=1000 \
    --ckpt-dir $CKPT --metrics $CKPT/metrics.jsonl
  stage 1800 $PY infer.py --preset sino_unet_radial --ckpt-dir $CKPT \
    --ckpt best --n-slices 64 \
    --json-out artifacts/sino_unet_radial_stem2_34k_test.json
  publish "sino_unet_radial stem-2 extension: chunk $CHUNK plateau measurement"
  # finished all 34k steps? the last metrics line says so
  tail -n 1 $CKPT/metrics.jsonl 2>/dev/null | grep -q '"step": 34000' && break
done

# ---- Z. Catch-all: fill anything a wedge or deadline skipped -------------
stage 3600 $PY scripts/ood_eval.py
publish "Fill remaining OOD cells"

echo "=== [$(date +%H:%M:%S)] round-5 s2 queue drained (t=$(( $(date +%s) - START ))s) ===" >&2
