#!/usr/bin/env python
"""Inference / evaluation entry point (SURVEY.md §2b C11, §3.2).

Reference shape: load checkpoint → run test split → per-slice PSNR/SSIM →
aggregate mean±std table → qualitative PNG export.

Usage:
  python infer.py --preset fbp_unet_parallel --ckpt-dir runs/x --n-slices 64
  python infer.py --preset pdunet_parallel --data slices.h5 --split test
  python infer.py --preset ... --export-png out/ --export-count 4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pathlib
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset")
    p.add_argument("--config")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--ckpt-dir", default=None, help="checkpoint to evaluate")
    p.add_argument("--ckpt", default="latest",
                   help="which checkpoint: latest | best | <step>")
    p.add_argument("--data", default=None, help="HDF5 slice dataset (else synthetic)")
    p.add_argument("--split", default="test")
    p.add_argument("--n-slices", type=int, default=64,
                   help="synthetic test-set size (ignored with --data)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--corrupt", action="store_true",
                   help="evaluate under the task's training corruption "
                        "(e.g. low-dose noise) instead of noiseless synthesis")
    p.add_argument("--hu-window", nargs=2, type=float, default=None,
                   metavar=("CENTER", "WIDTH"),
                   help="score PSNR/SSIM in a clinical HU display window "
                        "(e.g. 40 400 for soft tissue): recon and ground "
                        "truth are mapped relative-attenuation → HU → "
                        "clipped [0,1] window first. Use with HU-domain "
                        "datasets (convert_volume(domain='hu'))")
    p.add_argument("--export-png", default=None, help="directory for PNG dumps")
    p.add_argument("--export-count", type=int, default=4)
    p.add_argument("--json-out", default=None, help="write metrics JSON here")
    p.add_argument("--platform", default=None)
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel eval over the first N devices: params "
                        "replicated, each batch sharded over the 'data' mesh "
                        "axis (XLA inserts the collectives over ICI). The "
                        "batch size must be divisible by N")
    p.add_argument("--watchdog-secs", type=float,
                   default=float(os.environ.get("PDUNET_WATCHDOG_SECS", 0)),
                   help="abort (exit 87) if no eval batch completes for this "
                        "many seconds (wedged-RPC bound; see train.py). "
                        "0 disables")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from pdunet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.watchdog_secs > 0:
        # arm BEFORE any device work: the axon RPC can wedge inside
        # build_task/opnorm estimation, long before the eval loop
        # (observed round 5: infer stuck 19 min at 0% CPU pre-arming)
        from pdunet_tpu.utils import watchdog

        watchdog.start(args.watchdog_secs, label="infer")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from train import resolve_config  # same config resolution as training

    config = resolve_config(args)
    import jax.numpy as jnp

    from pdunet_tpu.ops.metrics import psnr, ssim
    from pdunet_tpu.training.tasks import build_task

    if args.batch:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, batch_size=args.batch)
        )
    task = build_task(config)
    B = config.train.batch_size

    mesh = None
    if args.devices and args.devices > 1:
        # Data-parallel eval (SURVEY.md §2d P1 on the inference surface):
        # the recon jit shards every batch leaf's leading dim over the
        # 'data' axis and replicates params, so N chips each reconstruct
        # B/N slices — the same scale axis the training step uses.
        from pdunet_tpu.parallel import make_mesh

        if B % args.devices:
            raise SystemExit(
                f"--devices {args.devices} must divide batch size {B}"
            )
        mesh = make_mesh(args.devices)

    key = jax.random.PRNGKey(0)
    params = task.init_params(key)
    if args.ckpt_dir:
        import os

        from pdunet_tpu.training.checkpoint import CheckpointManager
        from pdunet_tpu.training.loop import build_state

        ckpt_dir, step = args.ckpt_dir, None
        if args.ckpt == "best":
            # best-val weights live in their own single-slot manager so
            # keep-N rotation never deletes them (Lightning best-ckpt parity)
            ckpt_dir = os.path.join(args.ckpt_dir, "best")
        elif args.ckpt != "latest":
            step = int(args.ckpt)
        mgr = CheckpointManager(ckpt_dir)
        template = build_state(task, params=params)
        restored = mgr.restore(template, step=step)
        if restored is None:
            raise SystemExit(f"no {args.ckpt} checkpoint found in {ckpt_dir}")
        params = restored.params
        print(f"[infer] restored step {int(restored.step)} ({args.ckpt}) from {ckpt_dir}")
    else:
        print("[infer] WARNING: no --ckpt-dir; evaluating randomly-initialized params")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from pdunet_tpu.parallel import replicate

        params = replicate(params, mesh)

        def _constrain(x):
            return jax.lax.with_sharding_constraint(
                x,
                NamedSharding(
                    mesh, PartitionSpec("data", *([None] * (x.ndim - 1)))
                ),
            )

        recon_j = jax.jit(
            lambda p, b: task.recon_fn(
                p, jax.tree_util.tree_map(_constrain, b)
            ),
            out_shardings=NamedSharding(mesh, PartitionSpec()),
        )
    else:
        recon_j = jax.jit(lambda p, b: task.recon_fn(p, b))
    if args.hu_window:
        from pdunet_tpu.data.pipeline import MU_WATER, mu_to_hu, normalize_ct_window

        center, width = args.hu_window

        def _windowed(x):
            # slices are relative attenuation μ/μ_water (SliceDataset converts
            # HU volumes on read); scoring happens in the clipped HU window —
            # the clinically meaningful error metric for CT (SURVEY.md C4)
            return normalize_ct_window(mu_to_hu(x * MU_WATER), center, width)

        # the window maps to [0,1] by construction, so score against that
        # fixed range: a slice with no content inside the window (e.g. an
        # air-dominated slice under a soft-tissue window) has target
        # peak-to-peak 0, and the per-image default would poison the
        # aggregate with -inf/NaN PSNR
        metric_j = jax.jit(
            lambda r, t: (psnr(_windowed(r), _windowed(t), data_range=1.0),
                          ssim(_windowed(r), _windowed(t), data_range=1.0))
        )
    else:
        metric_j = jax.jit(
            lambda r, t: (psnr(r, t), ssim(r, t))
        )

    all_psnr, all_ssim = [], []
    exported = 0
    export_dir = pathlib.Path(args.export_png) if args.export_png else None
    if export_dir:
        export_dir.mkdir(parents=True, exist_ok=True)

    def eval_batch(batch, tag):
        nonlocal exported
        recon = recon_j(params, batch)
        ps, ss = metric_j(recon, batch["image"])
        all_psnr.extend(np.asarray(ps).ravel().tolist())
        all_ssim.extend(np.asarray(ss).ravel().tolist())
        from pdunet_tpu.utils import watchdog as _wd

        _wd.beat()  # the asarray fetch above blocks on the device, so a
        # beat here means one whole batch round-tripped
        if export_dir and exported < args.export_count:
            from PIL import Image

            def dump(arr, name):
                a = np.asarray(arr, np.float32)
                a = (a - a.min()) / max(a.max() - a.min(), 1e-9)
                Image.fromarray((a * 255).astype(np.uint8)).save(
                    export_dir / f"{tag}_{name}.png"
                )

            for i in range(min(args.export_count - exported, recon.shape[0])):
                dump(recon[i], f"{exported:03d}_recon")
                dump(batch["image"][i], f"{exported:03d}_gt")
                exported += 1

    corrupt_key = jax.random.PRNGKey(args.seed + 1) if args.corrupt else None

    if args.data:
        from pdunet_tpu.data.datasets import SliceDataset, iterate_batches

        ds = SliceDataset(args.data, split=args.split)
        for bi, images in enumerate(
            iterate_batches(ds, B, shuffle=False, epochs=1)
        ):
            if np.iscomplexobj(images):
                # (re, im) pair: complex64 cannot cross host→device on axon
                images = (
                    jnp.asarray(images.real, jnp.float32),
                    jnp.asarray(images.imag, jnp.float32),
                )
            else:
                images = jnp.asarray(images)
            # measurement synthesis through the task's physics; --corrupt
            # adds the training-time noise so eval matches the trained task
            key = jax.random.fold_in(corrupt_key, bi) if args.corrupt else None
            batch = task.batch_from_images(images, key)
            eval_batch(batch, f"b{bi}")
    else:
        n_batches = max(1, args.n_slices // B)
        data_key = jax.random.PRNGKey(args.seed)
        for bi in range(n_batches):
            if args.corrupt:
                # make_batch already applies the training corruption
                batch = task.make_batch(jax.random.fold_in(data_key, bi))
            else:
                clean = task.make_batch(jax.random.fold_in(data_key, bi))
                img = clean.get("image_c", clean["image"])
                if jnp.iscomplexobj(img):
                    img = (jnp.real(img), jnp.imag(img))
                batch = task.batch_from_images(img)
            eval_batch(batch, f"b{bi}")

    table = {
        "n_slices": len(all_psnr),
        "psnr_mean": float(np.mean(all_psnr)),
        "psnr_std": float(np.std(all_psnr)),
        "ssim_mean": float(np.mean(all_ssim)),
        "ssim_std": float(np.std(all_ssim)),
    }
    print(f"[infer] {config.name}: "
          f"PSNR {table['psnr_mean']:.2f} ± {table['psnr_std']:.2f} dB  "
          f"SSIM {table['ssim_mean']:.4f} ± {table['ssim_std']:.4f}  "
          f"({table['n_slices']} slices)")
    if args.json_out:
        pathlib.Path(args.json_out).write_text(json.dumps(table, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
