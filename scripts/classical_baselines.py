#!/usr/bin/env python
"""Classical (non-learned) reconstruction baselines per acceleration factor.

The quality-vs-acceleration table (scripts/acceleration_sweep.py) needs the
method-free anchor the paper's tables carry: what sparse-view FBP (CT) /
DCF-adjoint NUFFT (radial MRI) alone scores at each undersampling factor.
The training tasks already compute exactly that classical recon as the
network input (batch["f0"]), so this script scores it directly on the same
synthetic held-out distribution infer.py uses, per (geometry, sparsity).

Writes ``artifacts/classical_baselines.json``.

    python scripts/classical_baselines.py [--platform cpu --tiny]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sparsities", default="2,4,8")
    p.add_argument("--n-slices", type=int, default=64)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--platform", default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from pdunet_tpu.utils import enable_compilation_cache, watchdog

    enable_compilation_cache()
    import os

    watchdog.start(float(os.environ.get("PDUNET_WATCHDOG_SECS", 0)),
                   label="classical_baselines")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.ops.metrics import psnr, ssim
    from pdunet_tpu.training.tasks import build_task

    rows = []
    for preset in ("pdunet_parallel", "pdunet_fan", "pdunet_radial"):
        for k in (int(s) for s in args.sparsities.split(",")):
            over = {"geometry.sparsity": k, "train.batch_size": 8}
            if args.tiny:
                over.update({"geometry.image_size": 32,
                             "geometry.n_angles": 40})
                if preset.endswith("radial"):
                    over["geometry.samples_per_spoke"] = 48
            config = get_preset(preset).override(over)
            task = build_task(config)
            make = jax.jit(task.make_batch)

            # jit the scoring: eager jnp on the axon backend is one remote
            # compile per primitive (SSIM alone is dozens)
            @jax.jit
            def score(b):
                f0, img = b["f0"], b["image"]
                if jax.numpy.iscomplexobj(f0):
                    f0, img = jax.numpy.abs(f0), jax.numpy.abs(img)
                return psnr(f0, img), ssim(f0, img)

            all_ps, all_ss = [], []
            key = jax.random.PRNGKey(args.seed)
            n_batches = -(-args.n_slices // 8)
            for bi in range(n_batches):
                ps, ss = score(make(jax.random.fold_in(key, bi)))
                all_ps.extend(np.asarray(ps).ravel().tolist())
                all_ss.extend(np.asarray(ss).ravel().tolist())
                watchdog.beat()  # one batch round-tripped the device
            row = {
                "geometry": config.geometry.kind,
                "preset": preset,
                "sparsity": k,
                "method": ("dcf_adjoint" if config.geometry.kind == "radial"
                           else "fbp"),
                "n_slices": len(all_ps),
                "psnr_mean": round(float(np.mean(all_ps)), 3),
                "ssim_mean": round(float(np.mean(all_ss)), 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = REPO / "artifacts" / "classical_baselines.json"
    out.write_text(json.dumps({"cells": rows}, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
