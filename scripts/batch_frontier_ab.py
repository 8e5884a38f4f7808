#!/usr/bin/env python
"""Matched-sample-budget batch-size A/B for the training frontier.

VERDICT r3 weak #2: the measured train-throughput frontier is batch 128 +
remat (326 slices/s) or batch 32 (292), yet every preset ships batch_size=4.
This script answers "does large-batch + scaled LR match quality at the same
sample budget?" by training the flagship preset at several (batch, lr,
remat) points with an identical number of SAMPLES, then scoring each
best-val checkpoint on the same held-out slices.

Runs sequentially (the TPU is single-client); each run is a train.py /
infer.py subprocess so auto-resume works if interrupted. Results land in
``artifacts/batch_ab.json``.

    python scripts/batch_frontier_ab.py [--preset pdunet_parallel]
        [--samples 96000] [--platform cpu --tiny]   # dev smoke
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def run(cmd: list[str]) -> float:
    print("+", " ".join(cmd), flush=True)
    t0 = time.monotonic()
    subprocess.run(cmd, check=True, cwd=REPO)
    return time.monotonic() - t0


def train_and_eval(preset: str, tag: str, sets: list[str], steps: int,
                   n_slices: int, platform: str | None,
                   extra_geo: list[str]) -> dict:
    ckpt = REPO / "runs" / "ab" / tag
    common = [f"--set={s}" for s in sets + extra_geo]
    plat = ["--platform", platform] if platform else []
    t_train = run([sys.executable, "train.py", "--preset", preset,
                   "--steps", str(steps), *common, *plat,
                   "--ckpt-dir", str(ckpt),
                   "--metrics", str(ckpt / "metrics.jsonl")])
    out = REPO / "artifacts" / "ab" / f"{tag}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    run([sys.executable, "infer.py", "--preset", preset, *common, *plat,
         "--ckpt-dir", str(ckpt), "--ckpt", "best",
         "--n-slices", str(n_slices), "--json-out", str(out)])
    metrics = json.loads(out.read_text())
    # steady-state step time: median of consecutive wall_s deltas between
    # train log rows (skips the compile-heavy first interval)
    step_sec = None
    jl = ckpt / "metrics.jsonl"
    if jl.exists():
        rows = [json.loads(l) for l in jl.read_text().splitlines() if l]
        pts = [(r["step"], r["wall_s"]) for r in rows
               if "wall_s" in r and "loss" in r]
        deltas = [(w1 - w0) / (s1 - s0)
                  for (s0, w0), (s1, w1) in zip(pts, pts[1:]) if s1 > s0]
        if deltas:
            step_sec = round(sorted(deltas)[len(deltas) // 2], 4)
    return {"tag": tag, "steps": steps, "overrides": sets,
            "train_wall_sec": round(t_train, 1),
            "median_step_sec": step_sec,
            "psnr": metrics.get("psnr_mean"), "ssim": metrics.get("ssim_mean")}


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="pdunet_parallel")
    p.add_argument("--samples", type=int, default=96_000,
                   help="matched sample budget per arm")
    p.add_argument("--n-slices", type=int, default=64)
    p.add_argument("--platform", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="32x32/40-angle dev geometry (CPU smoke)")
    p.add_argument("--arms", default=None,
                   help="comma list of arm tags to (re)run; default all")
    args = p.parse_args()

    extra_geo = []
    if args.tiny:
        extra_geo = ["geometry.image_size=32", "geometry.n_angles=40",
                     "train.val_slices=8", "model.base_features=8",
                     "model.n_iters=2", "model.use_bfloat16=false"]

    S = args.samples
    # lr scaling from the shipped batch-4 base (1e-3): sqrt and linear in
    # batch ratio — Adam usually wants sqrt; VERDICT asked for linear too.
    arms = {
        "b4": dict(batch=4, lr=1e-3, remat=False, warmup=200, eval_every=1000),
        "b32_sqrt": dict(batch=32, lr=2.83e-3, remat=False, warmup=150,
                         eval_every=150),
        "b32_lin": dict(batch=32, lr=8e-3, remat=False, warmup=150,
                        eval_every=150),
        "b128_sqrt": dict(batch=128, lr=5.66e-3, remat=True, warmup=50,
                          eval_every=50),
        "b128_lin": dict(batch=128, lr=3.2e-2, remat=True, warmup=50,
                         eval_every=50),
        # recovery arms: the sqrt-scaled LR collapsed mid-run at clip 2.0
        # (val 47.96@450 -> 37.85@600, never recovered) — same stranded-
        # Adam signature as the preset comments. Probe a tighter clip and
        # the unscaled base LR.
        "b32_sqrt_clip05": dict(batch=32, lr=2.83e-3, remat=False,
                                warmup=150, eval_every=150, clip=0.5),
        "b32_base": dict(batch=32, lr=1e-3, remat=False, warmup=150,
                         eval_every=150),
    }
    if args.arms:
        keep = set(args.arms.split(","))
        arms = {k: v for k, v in arms.items() if k in keep}

    results = []
    for tag, a in arms.items():
        steps = max(S // a["batch"], 1)
        every = min(a["eval_every"], steps)  # tiny smoke runs still eval
        sets = [f"train.batch_size={a['batch']}",
                f"train.learning_rate={a['lr']}",
                f"train.warmup_steps={a['warmup']}",
                f"train.eval_every={every}",
                f"train.ckpt_every={every}",
                f"model.remat={'true' if a['remat'] else 'false'}"]
        if "clip" in a:
            sets.append(f"train.grad_clip={a['clip']}")
        results.append(train_and_eval(
            args.preset, f"{args.preset}_{tag}", sets, steps,
            args.n_slices, args.platform, extra_geo))
        print(json.dumps(results[-1]), flush=True)

    out = REPO / "artifacts" / "batch_ab.json"
    # merge with prior invocations (running extra --arms must not drop rows)
    merged = {}
    if out.exists():
        for r in json.loads(out.read_text()).get("arms", []):
            merged[r["tag"]] = r
    for r in results:
        merged[r["tag"]] = r
    payload = {"preset": args.preset, "samples": S,
               "arms": list(merged.values())}
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
