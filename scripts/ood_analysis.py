#!/usr/bin/env python
"""Root-cause analysis of the OOD generalization gaps (VERDICT r4 #2).

The OOD table (scripts/ood_eval.py) exposes >3 dB drops — e.g.
sino_unet_parallel 41.8 → 31.1 dB on Shepp-Logan, lpd_parallel 47.7 → 33.3
dB on the HU volume — without saying WHY. This script attributes each gap
with measured evidence instead of speculation. Per (preset, kind) cell it
reports, alongside the model PSNR:

  * anchor_psnr — classical FBP/DCF-adjoint recon of the same sparse
    measurement. If the anchor drops as much as the model, the family is
    intrinsically harder (difficulty, not generalization failure); if the
    anchor holds while the model drops, the learned prior is the problem.
  * resid_rel — CT only: relative measurement residual ‖A(x̂) − y‖/‖y‖.
    A residual at in-distribution levels while PSNR collapses means the
    error lives in A's null space (the prior hallucinates content the
    measurements cannot contradict); a blown-up residual means the network
    is corrupting even measured components.
  * psnr_raw — HU volume only: PSNR in raw attenuation units next to the
    windowed score, separating the display-window metric convention from
    actual quality loss.
  * amplitude probe (--amplitudes) — re-evaluates the cell at scaled
    intensities α·x. Training fixes the intensity regime (ellipse densities
    in [-1,1] / [0.1,1]); if PSNR recovers when α pulls the family into
    that regime, the gap is amplitude statistics, not structure.
  * worst-case PNG triptychs (gt | classical anchor | model) of the lowest-
    PSNR slices, artifacts/ood_analysis/<preset>_<kind>_worst*.png.

Cells land in artifacts/ood_analysis/<preset>_<kind>.json; the README's
OOD-analysis paragraph cites them.

    python scripts/ood_analysis.py --presets lpd_parallel --kinds hu_volume
    python scripts/ood_analysis.py --tiny --platform cpu   # dev smoke
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

DEFAULT_PRESETS = (
    "pdunet_parallel", "fbp_unet_parallel", "sino_unet_parallel",
    "lpd_parallel", "pdunet_fan", "pdunet_radial", "sino_unet_radial",
)
KINDS = ("indist", "shepp_logan", "rectangles", "smooth", "textured",
         "hu_volume")


def build_eval_ops(config):
    """The task's sparse physics at f32 — same construction as
    tasks.build_task's synthesis ops (tasks.py:185-189), rebuilt here
    because Task does not expose its operators."""
    import jax.numpy as jnp

    from pdunet_tpu.training.tasks import build_geometries

    _, sparse = build_geometries(config.geometry)
    if config.geometry.kind == "fan":
        from pdunet_tpu.ops.radon.fan import make_fan_ops

        return make_fan_ops(sparse, dtype=jnp.float32)
    if config.geometry.kind == "radial":
        from pdunet_tpu.ops.nufft import make_radial_ops

        return make_radial_ops(sparse, dtype=jnp.float32)
    from pdunet_tpu.ops.radon import make_parallel_ops

    return make_parallel_ops(sparse, dtype=jnp.float32)


def load_slices(kind, config, n, out_dir, force=False):
    """(mag, phase|None) float32 ground-truth slices for a kind.

    Reuses ood_eval's deterministic generators (seed 99) so the analysis
    scores the exact slices the OOD table scored."""
    import h5py

    from ood_eval import write_hu_volume, write_ood_h5

    is_complex = config.geometry.kind == "radial"
    N = config.geometry.image_size
    if kind == "indist":
        # the same held-out synthetic distribution infer.py evaluates
        return None, None
    h5 = out_dir / f"ood_{kind}_{N}{'_cplx' if is_complex else ''}.h5"
    if not h5.exists() or force:
        if kind == "hu_volume":
            write_hu_volume(h5, n, N)
        else:
            write_ood_h5(h5, kind, n, N, is_complex)
    with h5py.File(h5, "r") as f:
        mag = np.asarray(f["slices"][:n], np.float32)
        phase = (np.asarray(f["phase"][:n], np.float32)
                 if "phase" in f else None)
        if f.attrs.get("domain", "mu") == "hu" or kind == "hu_volume":
            # SliceDataset's HU→μ/μ_water read conversion (datasets.py)
            mag = 1.0 + mag / 1000.0
    return mag, phase


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--presets", default=",".join(DEFAULT_PRESETS))
    p.add_argument("--kinds", default=",".join(KINDS))
    p.add_argument("--ckpt-root", default="runs/sweep")
    p.add_argument("--suffix", default="_s4")
    p.add_argument("--sparsity", type=int, default=4)
    p.add_argument("--n-slices", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--amplitudes", default="",
                   help="comma-separated α grid for the intensity-regime "
                        "probe (e.g. 0.25,0.5,1.0); empty disables")
    p.add_argument("--export-worst", type=int, default=2)
    p.add_argument("--platform", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--out-dir", default=str(REPO / "artifacts" / "ood_analysis"))
    p.add_argument("--force", action="store_true")
    args = p.parse_args()

    from pdunet_tpu.utils import enable_compilation_cache, watchdog

    enable_compilation_cache()
    import os

    watchdog.start(float(os.environ.get("PDUNET_WATCHDOG_SECS", 0)),
                   label="ood_analysis")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import dataclasses

    import jax.numpy as jnp

    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.data.pipeline import MU_WATER, mu_to_hu, normalize_ct_window
    from pdunet_tpu.ops.metrics import psnr
    from pdunet_tpu.training.checkpoint import CheckpointManager
    from pdunet_tpu.training.loop import build_state
    from pdunet_tpu.training.tasks import build_task

    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    amps = [float(a) for a in args.amplitudes.split(",") if a]

    for preset in args.presets.split(","):
        overrides = {"geometry.sparsity": str(args.sparsity)}
        overrides.update(s.split("=", 1) for s in args.set)
        if args.tiny:
            overrides.update({"geometry.image_size": "32",
                              "geometry.n_angles": "40"})
            if preset.endswith("radial"):
                overrides["geometry.samples_per_spoke"] = "48"
        config = get_preset(preset).override(overrides)
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train,
                                              batch_size=args.batch))
        is_complex = config.geometry.kind == "radial"
        is_ct = not is_complex
        ckpt = REPO / args.ckpt_root / f"{preset}{args.suffix}"
        if not (ckpt / "best").exists():
            print(f"[skip] {preset}: no checkpoint at {ckpt}", flush=True)
            continue
        task = build_task(config)
        template = build_state(task, params=task.init_params(
            jax.random.PRNGKey(0)))
        restored = CheckpointManager(str(ckpt / "best")).restore(template)
        if restored is None:
            print(f"[skip] {preset}: empty best slot at {ckpt}", flush=True)
            continue
        params = restored.params
        ops = build_eval_ops(config)
        recon_j = jax.jit(lambda pr, b: task.recon_fn(pr, b))

        def classical(img):
            return ops.fbp(ops.A(img))

        classical_j = jax.jit(classical)
        psnr_j = jax.jit(lambda r, t: psnr(r, t))
        A_j = jax.jit(ops.A)

        def _win(x):
            # soft-tissue window C40/W400, the ood_eval scoring convention
            return normalize_ct_window(mu_to_hu(x * MU_WATER), 40.0, 400.0)

        psnr_win_j = jax.jit(
            lambda r, t: psnr(_win(r), _win(t), data_range=1.0))

        def resid_rel(recon, y):
            # CT: recon is the real image estimate; measurement residual
            # relative to the sparse data (per slice)
            Ar = ops.A(recon)
            num = jnp.sqrt(jnp.sum((Ar - y) ** 2, axis=(-2, -1)))
            den = jnp.sqrt(jnp.sum(y ** 2, axis=(-2, -1)))
            return num / den

        resid_j = jax.jit(resid_rel) if is_ct else None

        for kind in args.kinds.split(","):
            if kind == "hu_volume" and not is_ct:
                continue
            out = out_dir / f"{preset}_{kind}.json"
            if out.exists() and not args.force:
                print(f"[skip] {preset}/{kind} (artifact exists)", flush=True)
                continue
            mag, phase = load_slices(kind, config, args.n_slices, out_dir,
                                     args.force)
            rows = {"psnr": [], "anchor_psnr": [], "resid_model": [],
                    "resid_anchor": [], "psnr_raw": []}
            amp_psnr = {a: [] for a in amps}
            worst = []  # (psnr, gt, anchor, recon) candidates
            B = args.batch
            n = args.n_slices if mag is None else min(args.n_slices, len(mag))
            key = jax.random.PRNGKey(1234)  # infer.py's synthetic eval seed

            for bi in range(max(1, n // B)):
                if mag is None:  # in-distribution reference row
                    clean = task.make_batch(jax.random.fold_in(key, bi))
                    img = clean.get("image_c", clean["image"])
                else:
                    m = mag[bi * B:(bi + 1) * B]
                    if len(m) < B:
                        break
                    if is_complex:
                        ph = phase[bi * B:(bi + 1) * B]
                        img = jax.lax.complex(
                            jnp.asarray(m * np.cos(ph)),
                            jnp.asarray(m * np.sin(ph)))
                    else:
                        img = jnp.asarray(m)
                pair = ((jnp.real(img), jnp.imag(img))
                        if jnp.iscomplexobj(img) else img)
                batch = task.batch_from_images(pair)
                gt = batch["image"]
                recon = recon_j(params, batch)
                anchor = classical_j(img)
                anchor_m = jnp.abs(anchor) if is_complex else anchor

                if kind == "hu_volume":
                    # score BOTH conventions: the OOD table's windowed
                    # number and the raw attenuation-domain number
                    rows["psnr_raw"].extend(
                        np.asarray(psnr_j(recon, gt)).tolist())
                    ps = psnr_win_j(recon, gt)
                    pa = psnr_win_j(anchor_m, gt)
                else:
                    ps = psnr_j(recon, gt)
                    pa = psnr_j(anchor_m, gt)
                rows["psnr"].extend(np.asarray(ps).tolist())
                rows["anchor_psnr"].extend(np.asarray(pa).tolist())

                if resid_j is not None:
                    y = batch["sino"] if "sino" in batch else A_j(gt)
                    rows["resid_model"].extend(
                        np.asarray(resid_j(recon, y)).tolist())
                    rows["resid_anchor"].extend(
                        np.asarray(resid_j(anchor_m, y)).tolist())

                for a in amps:
                    ab = task.batch_from_images(
                        jax.tree_util.tree_map(lambda x: x * a, pair))
                    amp_psnr[a].extend(np.asarray(
                        psnr_j(recon_j(params, ab), ab["image"])).tolist())

                ps_np = np.asarray(ps)
                for i in np.argsort(ps_np)[: args.export_worst]:
                    worst.append((float(ps_np[i]), np.asarray(gt[i]),
                                  np.asarray(anchor_m[i]),
                                  np.asarray(recon[i])))

            worst.sort(key=lambda w: w[0])
            png_paths = []
            try:
                from PIL import Image

                for j, (pv, g, a_, r) in enumerate(worst[: args.export_worst]):
                    trip = np.concatenate([g, a_, r], axis=1)
                    lo, hi = np.percentile(trip, [1, 99])
                    trip = np.clip((trip - lo) / max(hi - lo, 1e-9), 0, 1)
                    path = out_dir / f"{preset}_{kind}_worst{j}.png"
                    Image.fromarray((trip * 255).astype(np.uint8)).save(path)
                    png_paths.append(path.name)
            except Exception as e:  # PNG export must never kill the numbers
                print(f"[warn] PNG export failed: {e}", flush=True)

            cell = {"preset": preset, "kind": kind,
                    "n_slices": len(rows["psnr"]),
                    "psnr_mean": round(float(np.mean(rows["psnr"])), 3),
                    "anchor_psnr_mean": round(
                        float(np.mean(rows["anchor_psnr"])), 3),
                    "worst_png": png_paths}
            if rows["psnr_raw"]:
                cell["psnr_raw_mean"] = round(
                    float(np.mean(rows["psnr_raw"])), 3)
            if rows["resid_model"]:
                cell["resid_rel_model"] = round(
                    float(np.mean(rows["resid_model"])), 5)
                cell["resid_rel_anchor"] = round(
                    float(np.mean(rows["resid_anchor"])), 5)
            if amps:
                cell["amplitude_psnr"] = {
                    str(a): round(float(np.mean(v)), 3)
                    for a, v in amp_psnr.items()}
            out.write_text(json.dumps(cell, indent=2) + "\n")
            print(json.dumps(cell), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
