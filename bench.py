#!/usr/bin/env python
"""Benchmark entry point (SURVEY.md §6; BASELINE.json:2).

Prints ONE JSON line with the headline metric: 256² sparse-view CT
reconstructions per second per chip through the flagship Primal-Dual UNet
(inference). ``vs_baseline`` is the ratio against the BASELINE.json:5
target of 125 slices/sec/chip (1000/s on a v5e-8 ÷ 8 chips).

Run with no args on the TPU (exclusive access — the chip is single-client).
``--all`` appends secondary rows (projector / FBP / train-step) to stderr
and bench_details.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

TARGET_PER_CHIP = 125.0  # BASELINE.json:5: ≥1000/s on v5e-8


def timeit(fn, *args, warmup=3, iters=10):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n-iters", type=int, default=4)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--platform", default=None)
    p.add_argument("--all", action="store_true", help="also run secondary benches")
    p.add_argument("--bf16", action="store_true", help="bfloat16 network compute")
    args = p.parse_args(argv)

    import jax

    from pdunet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.training.tasks import build_task

    config = get_preset("pdunet_parallel")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=args.image_size, n_angles=360, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, n_iters=args.n_iters, use_bfloat16=args.bf16
        ),
        train=dataclasses.replace(config.train, batch_size=args.batch),
    )
    task = build_task(config)
    key = jax.random.PRNGKey(0)
    params = task.init_params(key)
    batch = task.make_batch(key)

    recon = jax.jit(lambda p, b: task.recon_fn(p, b))
    dt = timeit(recon, params, batch)
    per_chip = args.batch / dt

    result = {
        "metric": "pdunet_256_sparse_ct_recon_throughput",
        "value": round(per_chip, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(per_chip / TARGET_PER_CHIP, 3),
    }
    print(json.dumps(result))

    if args.all:
        from pdunet_tpu.ops.radon.parallel import make_parallel_ops
        from pdunet_tpu.training.tasks import build_geometries

        details = {"primary": result, "config": {"batch": args.batch,
                   "n_iters": args.n_iters, "image_size": args.image_size,
                   "bf16": args.bf16}}
        _, sparse_geom = build_geometries(config.geometry)
        ops = make_parallel_ops(sparse_geom)
        img = batch["image"]
        sino = batch["sino"]

        A_j = jax.jit(ops.A)
        dt_a = timeit(A_j, img)
        details["radon_fwd_slices_per_sec"] = round(args.batch / dt_a, 2)

        At_j = jax.jit(ops.At)
        dt_at = timeit(At_j, sino)
        details["radon_adj_slices_per_sec"] = round(args.batch / dt_at, 2)

        fbp_j = jax.jit(ops.fbp)
        dt_f = timeit(fbp_j, sino)
        details["fbp_slices_per_sec"] = round(args.batch / dt_f, 2)

        from pdunet_tpu.training.loop import make_train_step

        step = make_train_step(task, donate=False)
        import optax
        from flax.training import train_state

        state = train_state.TrainState.create(
            apply_fn=None, params=params, tx=optax.adam(1e-3)
        )
        dt_t = timeit(lambda s, k: step(s, k)[1]["loss"], state, key, warmup=2, iters=5)
        details["train_step_sec"] = round(dt_t, 4)
        details["train_slices_per_sec"] = round(args.batch / dt_t, 2)

        print(json.dumps(details, indent=2), file=sys.stderr)
        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
