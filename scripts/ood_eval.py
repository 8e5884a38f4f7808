#!/usr/bin/env python
"""Out-of-distribution evaluation of trained checkpoints.

VERDICT r3 missing #2: all headline quality numbers are scored on held-out
samples of the same random-ellipse generator the models trained on. This
script scores trained best-val checkpoints on phantom families that
distribution cannot produce (data/phantoms.py OOD_KINDS):

  * shepp_logan — the classic 10-ellipse head phantom (denser + finer
    structure than the 8-ellipse training draw)
  * rectangles  — sharp corners
  * smooth      — low-frequency fields, nothing piecewise-constant
  * textured    — band-limited texture inside the support
  * hu_volume   — a full-scale textured volume stored in Hounsfield units,
    read back through SliceDataset's HU→μ conversion and scored with
    --hu-window (the reference's CT datasets are HU; exercises C12
    end-to-end at eval scale)

Each (preset, kind) writes ``artifacts/ood/<preset>_<kind>.json`` via
infer.py --data on a generated HDF5 store; a combined table lands in
``artifacts/ood_eval.json``. Complex (radial) presets get the nonneg
magnitude + smooth-polynomial-phase convention of write_phantom_dataset.

    python scripts/ood_eval.py --ckpt-root runs/sweep --suffix _s4
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DEFAULT_PRESETS = (
    "pdunet_parallel", "fbp_unet_parallel", "sino_unet_parallel",
    "lpd_parallel", "pdunet_fan", "pdunet_radial", "sino_unet_radial",
)


def write_ood_h5(path: pathlib.Path, kind: str, n: int, image_size: int,
                 complex_phase: bool, seed: int = 99) -> None:
    import h5py

    from pdunet_tpu.data.phantoms import ood_phantom

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("slices", (n, image_size, image_size),
                              np.float32)
        ph = (f.create_dataset("phase", (n, image_size, image_size),
                               np.float32) if complex_phase else None)
        for i in range(n):
            ds[i] = ood_phantom(kind, rng, image_size, nonneg=complex_phase)
            if ph is not None:
                ax = np.linspace(-1, 1, image_size)
                X, Y = np.meshgrid(ax, ax)
                c = rng.uniform(-np.pi, np.pi, 4)
                ph[i] = (c[0] * X + c[1] * Y + c[2] * X * Y
                         + c[3] * (X**2 - Y**2))
        f.attrs["splits"] = (0, 0, n)  # eval-only store: all test


def write_hu_volume(path: pathlib.Path, n: int, image_size: int,
                    seed: int = 99) -> None:
    """Textured phantoms rescaled to a plausible CT HU range (soft-tissue
    ±300 HU around water inside the body support, air = -1000 HU outside),
    stored via convert_volume(domain='hu').

    SliceDataset's read converts HU → μ/μ_water = 1 + HU/1000, so air maps
    to 0 — the same background convention the models trained in — while
    tissue lands around 1.0 (water). This matches real clinical CT (air
    surrounds the patient); mapping the background to water instead would
    hand every model a global DC shift no real scan has and the eval would
    measure only that."""
    from pdunet_tpu.data.datasets import convert_volume
    from pdunet_tpu.data.phantoms import ood_phantom

    rng = np.random.default_rng(seed)
    vol = np.stack([ood_phantom("textured", rng, image_size)
                    for _ in range(n)])
    support = np.abs(vol) > 1e-6
    hu = 300.0 * vol / max(np.abs(vol).max(), 1e-6)
    hu = np.where(support, hu, -1000.0).astype(np.float32)
    convert_volume(hu, str(path), domain="hu", train_frac=0.0, val_frac=0.0)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--presets", default=",".join(DEFAULT_PRESETS))
    p.add_argument("--kinds",
                   default="shepp_logan,rectangles,smooth,textured,hu_volume")
    p.add_argument("--ckpt-root", default="runs/sweep",
                   help="directory holding <preset><suffix>/ checkpoint dirs")
    p.add_argument("--suffix", default="_s4",
                   help="checkpoint dir suffix under --ckpt-root")
    p.add_argument("--n-slices", type=int, default=32)
    p.add_argument("--sparsity", type=int, default=4,
                   help="geometry.sparsity the checkpoints were trained at")
    p.add_argument("--platform", default=None)
    p.add_argument("--set", action="append", default=[],
                   help="extra config overrides forwarded to infer.py "
                        "(must match the checkpoint's training config)")
    p.add_argument("--out-dir", default=str(REPO / "artifacts" / "ood"),
                   help="cell artifact directory (point a smoke elsewhere "
                        "so it cannot shadow the real 256² cells)")
    p.add_argument("--force", action="store_true")
    args = p.parse_args()

    from pdunet_tpu.configs import get_preset

    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    plat = ["--platform", args.platform] if args.platform else []
    rows = []
    for preset in args.presets.split(","):
        # apply the forwarded overrides so the generated stores match the
        # geometry infer.py will actually evaluate at (e.g. a tiny-geometry
        # CPU smoke, or a non-shipped image size)
        overrides = dict(s.split("=", 1) for s in args.set)
        config = get_preset(preset).override(
            {"geometry.sparsity": str(args.sparsity), **overrides})
        is_complex = config.geometry.kind == "radial"
        image_size = config.geometry.image_size
        ckpt = REPO / args.ckpt_root / f"{preset}{args.suffix}"
        if not (ckpt / "best").exists():
            print(f"[skip] {preset}: no checkpoint at {ckpt}", flush=True)
            continue
        for kind in args.kinds.split(","):
            if kind == "hu_volume" and is_complex:
                continue  # HU is a CT concept
            out = out_dir / f"{preset}_{kind}.json"
            if out.exists() and not args.force:
                rows.append(json.loads(out.read_text()))
                continue
            h5 = out_dir / f"ood_{kind}_{image_size}{'_cplx' if is_complex else ''}.h5"
            if not h5.exists() or args.force:
                if kind == "hu_volume":
                    write_hu_volume(h5, args.n_slices, image_size)
                else:
                    write_ood_h5(h5, kind, args.n_slices, image_size,
                                 is_complex)
            cmd = [sys.executable, "infer.py", "--preset", preset,
                   f"--set=geometry.sparsity={args.sparsity}",
                   *[f"--set={s}" for s in args.set], *plat,
                   "--ckpt-dir", str(ckpt), "--ckpt", "best",
                   "--data", str(h5), "--split", "test",
                   "--n-slices", str(args.n_slices),
                   # eval the whole store in as few dispatches as possible:
                   # the preset batch (4) costs 8 round-trips per cell and
                   # the axon per-call overhead dominates 32-slice evals
                   "--batch", str(min(args.n_slices, 32)),
                   "--json-out", str(out)]
            if kind == "hu_volume":
                # soft-tissue display window: CENTER 40 / WIDTH 400 HU,
                # i.e. [-160, 240] — matches write_hu_volume's 0-300 HU
                # content range. (A previous revision passed "-150 250"
                # intending lo/hi, but infer.py takes center/width; the
                # resulting [-275, -25] window sat entirely below water
                # and produced degenerate PSNRs.)
                cmd += ["--hu-window", "40", "400"]
            print("+", " ".join(cmd), flush=True)
            subprocess.run(cmd, check=True, cwd=REPO)
            q = json.loads(out.read_text())
            q.update(preset=preset, kind=kind)
            out.write_text(json.dumps(q, indent=2) + "\n")
            rows.append(q)
            print(json.dumps(q), flush=True)

    # the canonical combined table only for the real artifact dir; a smoke
    # pointed at --out-dir elsewhere writes its table there instead
    if out_dir == REPO / "artifacts" / "ood":
        table = REPO / "artifacts" / "ood_eval.json"
    else:
        table = out_dir / "ood_eval.json"
    table.write_text(json.dumps({"cells": rows}, indent=2) + "\n")
    print(f"wrote {table} ({len(rows)} cells)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
