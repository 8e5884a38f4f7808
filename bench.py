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


def timeit(fn, x0, iters=10, aux=()):
    """Device-honest timing of ``fn`` (array[, *aux] → array).

    On the axon TPU backend ``jax.block_until_ready`` returns before remote
    execution finishes, so host-loop timing measures dispatch, not compute.
    Instead the repetition happens *on device*: a ``lax.fori_loop`` whose
    carry re-derives the input from each iteration's output (a scalar data
    dependency XLA cannot DCE), closed by a 4-byte scalar pull that forces
    completion. The loop bound is a traced scalar so the 0-iteration
    baseline (pull latency) shares the executable and subtracts cleanly.

    ``aux`` arrays are loop-invariant extra inputs to ``fn`` passed as jit
    ARGUMENTS rather than closure constants: closure constants get embedded
    as HLO literals, which both requires a host readback (UNIMPLEMENTED for
    complex64 on axon) and counts against the remote-compile HTTP body cap
    (observed 413 at a few hundred MB — large-batch radial k-space hits it).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(n, x, *aux):
        def body(_, x):
            out = fn(x, *aux)
            dep = jnp.real(jnp.ravel(out)[0]).astype(jnp.float32) * 1e-30
            return x * (1.0 + dep.astype(x.dtype))

        return jnp.real(jnp.ravel(lax.fori_loop(0, n, body, x))[0])

    from pdunet_tpu.utils import watchdog

    float(loop(iters, x0, *aux))  # compile + warm
    watchdog.beat()  # the long pole (compile) finished
    t0 = time.perf_counter()
    float(loop(0, x0, *aux))
    base = time.perf_counter() - t0
    while True:
        t0 = time.perf_counter()
        float(loop(iters, x0, *aux))
        total = time.perf_counter() - t0
        watchdog.beat()
        # cheap ops need enough device iterations that the ~25 ms scalar
        # pull latency (and its jitter) can't dominate the measurement
        if total - base >= 4.0 * base or iters >= 10000:
            break
        iters *= 8
    # The axon tunnel adds run-to-run jitter (observed ±15% on identical
    # builds). Repeat the calibrated loop and keep the fastest run: external
    # interference only ever adds time, so min-of-repeats estimates the
    # device's true steady-state cost.
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(iters, x0, *aux))
        total = min(total, time.perf_counter() - t0)
    return max(total - base, 1e-9) / iters


#: the batch each preset's end-to-end recon is benchmarked at (--all): large
#: enough to saturate (inference throughput plateaus by ~128-256 for the CT
#: presets), bounded for the complex radial tasks whose k-space activations
#: are the largest per-slice
MATRIX_BATCH = {
    "pdunet_parallel": 256,
    "fbp_unet_parallel": 256,
    "sino_unet_parallel": 128,
    "lpd_parallel": 256,
    "pdunet_fan": 128,
    # radial batches were capped at 64/32 while the whole batch entered the
    # timing loop as HLO closure constants (remote-compile 413 at a few
    # hundred MB of embedded k-space); with batch leaves as jit arguments
    # the saturating batches are measurable: 128 buys pdunet_radial ~6%
    # over 64, sino_unet_radial is flat past 64. The CT rows are already
    # saturated (measured on-chip: fan 1041 at 256 vs 1090 at 128; lpd 808
    # at 512 vs 822 at 256).
    "pdunet_radial": 128,
    "sino_unet_radial": 64,
}

#: which batch entry each model kind's recon_fn re-consumes as the timing
#: loop's carry (a real data dependency so back-to-back recons chain)
_CARRY_KEY = {"pdunet": "f0", "lpd": "f0", "fbp_unet": "fbp"}


def time_train_steps(step, state, key, iters: int = 5) -> float:
    """Seconds per train step, measured as an on-device fori_loop chain with
    the 0-iteration baseline subtracted (same methodology as :func:`timeit`;
    the optimizer state is the natural carry)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(n, s):
        def body(i, s):
            s2, _ = step(s, jax.random.fold_in(key, i))
            return s2

        out = lax.fori_loop(0, n, body, s)
        leaf = jax.tree_util.tree_leaves(out.params)[0]
        return jnp.real(jnp.ravel(leaf))[0]

    float(loop(2, state))  # compile + warm
    t0 = time.perf_counter()
    float(loop(0, state))
    base = time.perf_counter() - t0
    total = float("inf")
    for _ in range(3):  # min-of-repeats vs tunnel jitter (see timeit)
        t0 = time.perf_counter()
        float(loop(iters, state))
        total = min(total, time.perf_counter() - t0)
    return max(total - base, 1e-9) / iters


def preset_quality(name: str, stem: int | None = None) -> dict:
    """The preset's current held-out test quality, read from its committed
    infer artifact (``artifacts/<name>_test.json``, written by infer.py
    --json-out at the shipped config; ``<name>_stem1_test.json`` for stem
    overrides). Benched throughput rows carry these numbers so a speed
    "win" that silently degrades quality cannot land: the matrix row and
    the quality claim travel together (VERDICT r3 weak #4)."""
    import pathlib

    suffix = f"_stem{stem}" if stem is not None else ""
    path = (pathlib.Path(__file__).resolve().parent / "artifacts"
            / f"{name}{suffix}_test.json")
    if not path.exists():
        return {}
    q = json.loads(path.read_text())
    return {
        "test_psnr": round(q["psnr_mean"], 2),
        "test_ssim": round(q["ssim_mean"], 4),
        "quality_artifact": f"artifacts/{path.name}",
    }


def bench_preset_recon(
    name: str,
    batch_size: int,
    stem: int | None = None,
    image_size: int | None = None,
    n_angles: int | None = None,
    sparsity: int | None = None,
) -> dict:
    """End-to-end recon throughput of one shipped preset at its trained
    config (dtype/stem/n_iters as shipped) — the SURVEY.md §6 matrix row.

    ``stem`` overrides the preset's space-to-depth stem (README's
    speed/quality ladder: ``--preset-recon pdunet_parallel --stem 1``
    measures the quality-first configuration). ``image_size``/``n_angles``
    override the geometry for the --scale-scan ladder."""
    import dataclasses as dc

    import jax

    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.training.tasks import build_task

    config = get_preset(name)
    config = dc.replace(
        config, train=dc.replace(config.train, batch_size=batch_size)
    )
    if stem is not None:
        config = dc.replace(config, model=dc.replace(config.model, stem=stem))
    geom_over = {}
    if image_size is not None:
        geom_over["image_size"] = image_size
    if n_angles is not None:
        geom_over["n_angles"] = n_angles
    if sparsity is not None:
        geom_over["sparsity"] = sparsity
    if geom_over:
        config = dc.replace(
            config, geometry=dc.replace(config.geometry, **geom_over)
        )
    from pdunet_tpu.utils import watchdog

    task = build_task(config)
    watchdog.beat()  # opnorm estimation round-tripped the device
    key = jax.random.PRNGKey(0)
    params = task.init_params(key)
    batch = task.make_batch(key)
    jax.block_until_ready(batch)
    # each completed phase beats so the wedge watchdog bounds ONE compile,
    # not the whole multi-compile row (a full cold row can exceed 600 s
    # legitimately — observed on the 2x sparsity row, round 5)
    watchdog.beat()
    if config.model.kind == "sino_unet":
        carry_key = "k_in_w" if config.geometry.kind == "radial" else "sino_in"
    else:
        carry_key = _CARRY_KEY[config.model.kind]

    # Every batch leaf enters the timing loop as a jit ARGUMENT
    # (device-resident, never read back) — complex64 leaves are fine there,
    # and nothing batch-sized gets embedded as an HLO literal, so large
    # batches stay under the remote-compile request cap (timeit docstring).
    # Only the (small, compute-produced) params remain closure constants.
    carry0 = batch.pop(carry_key)
    aux_keys = sorted(batch.keys())
    aux = tuple(batch[k] for k in aux_keys)

    def recon_with_carry(x, *aux_vals):
        b = dict(zip(aux_keys, aux_vals))
        b[carry_key] = x
        return task.recon_fn(params, b)

    dt = timeit(recon_with_carry, carry0, aux=aux)
    row = {
        "preset": name,
        "batch": batch_size,
        "recon_slices_per_sec": round(batch_size / dt, 2),
        "sec_per_slice": round(dt / batch_size, 6),
    }
    if sparsity is not None:
        row["sparsity"] = sparsity
    if image_size is None and n_angles is None and sparsity is None:
        # at the shipped geometry the row speaks for the preset: attach its
        # current test quality so speed and quality are checked together
        row.update(preset_quality(name, stem))
    if geom_over:
        g = config.geometry
        row.update(image_size=g.image_size, n_angles=g.n_angles)
        # voxel throughput normalizes across sizes: recon work scales
        # ~O(n_angles·N·K) in the projector and O(N²) in the convs
        row["mpixels_per_sec"] = round(
            batch_size / dt * g.image_size * g.image_size / 1e6, 2
        )
    return row


def bench_unet_scan(batch: int = 128, image_size: int = 256,
                    base_features: int = 64, depth: int = 3) -> dict:
    """Attribute UNet device time (VERDICT r3 weak #1: conv-side MFU).

    Two readouts at the flagship fbp_unet shape (bf16, NHWC):
      * variants — full forward time for stem ∈ {1,2} × upsample ∈
        {convtranspose, shuffle}: the measured candidate fixes.
      * parts — each stem-2 component timed standalone at its true
        in-network shape (encoder/decoder ConvBlocks per level, both
        upsample ops, the 1×1 head), so the "where does UNet time go"
        question has a measured answer instead of a flops model.
    """
    import jax
    import jax.numpy as jnp

    from pdunet_tpu.models.unet import ConvBlock, UNet, depth_to_space

    def t_module(module, shape, dtype=jnp.bfloat16):
        x = jnp.ones(shape, dtype)
        params = module.init(jax.random.PRNGKey(0), x)
        return timeit(lambda v: module.apply(params, v), x)

    out = {"batch": batch, "image_size": image_size,
           "base_features": base_features, "depth": depth,
           "variants": [], "parts": []}
    for stem in (1, 2):
        for up in ("convtranspose", "shuffle"):
            m = UNet(base_features=base_features, depth=depth, stem=stem,
                     upsample=up, dtype=jnp.bfloat16)
            dt = t_module(m, (batch, image_size, image_size, 1),
                          jnp.float32)
            out["variants"].append({
                "stem": stem, "upsample": up,
                "ms_per_batch": round(dt * 1e3, 3),
                "slices_per_sec": round(batch / dt, 2)})

    # stem-2 per-level parts at their in-network shapes
    stem = 2
    m = UNet(base_features=base_features, depth=depth, stem=stem)
    feats = m.level_features()
    n0 = image_size // stem
    for d in range(depth):
        h = n0 >> d
        c_in = stem * stem if d == 0 else feats[d - 1]
        dt = t_module(ConvBlock(feats[d], dtype=jnp.bfloat16),
                      (batch, h, h, c_in))
        out["parts"].append({"part": f"enc{d}", "shape": [batch, h, h, c_in],
                             "features": feats[d],
                             "ms_per_batch": round(dt * 1e3, 3)})
    h = n0 >> depth
    dt = t_module(ConvBlock(feats[depth], dtype=jnp.bfloat16),
                  (batch, h, h, feats[depth - 1]))
    out["parts"].append({"part": "bottleneck",
                         "shape": [batch, h, h, feats[depth - 1]],
                         "features": feats[depth],
                         "ms_per_batch": round(dt * 1e3, 3)})
    import flax.linen as nn

    for d in reversed(range(depth)):
        h = n0 >> (d + 1)
        c_in = feats[d + 1] if d + 1 <= depth else feats[depth]
        dt_ct = t_module(nn.ConvTranspose(feats[d], (2, 2), strides=(2, 2),
                                          dtype=jnp.bfloat16),
                         (batch, h, h, c_in))
        out["parts"].append({"part": f"up{d}_convtranspose",
                             "shape": [batch, h, h, c_in],
                             "ms_per_batch": round(dt_ct * 1e3, 3)})

        class _Shuf(nn.Module):
            features: int

            @nn.compact
            def __call__(self, x):
                x = nn.Conv(self.features * 4, (1, 1),
                            dtype=jnp.bfloat16)(x)
                return depth_to_space(x, 2)

        dt_sh = t_module(_Shuf(feats[d]), (batch, h, h, c_in))
        out["parts"].append({"part": f"up{d}_shuffle",
                             "shape": [batch, h, h, c_in],
                             "ms_per_batch": round(dt_sh * 1e3, 3)})
        dt_dec = t_module(ConvBlock(feats[d], dtype=jnp.bfloat16),
                          (batch, h * 2, h * 2, 2 * feats[d]))
        out["parts"].append({"part": f"dec{d}",
                             "shape": [batch, h * 2, h * 2, 2 * feats[d]],
                             "ms_per_batch": round(dt_dec * 1e3, 3)})
    dt = t_module(nn.Conv(stem * stem, (1, 1), dtype=jnp.bfloat16),
                  (batch, n0, n0, feats[0]))
    out["parts"].append({"part": "head_1x1",
                         "shape": [batch, n0, n0, feats[0]],
                         "ms_per_batch": round(dt * 1e3, 3)})
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    # throughput saturates at batch 256 (measured: 32→781, 128→904,
    # 256→917, 512→911 slices/s/chip) — batch amortizes the per-dispatch
    # overhead and fills the MXU across the small UNet convolutions
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--n-iters", type=int, default=4)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--platform", default=None)
    p.add_argument("--all", action="store_true", help="also run secondary benches")
    p.add_argument("--matrix", action="store_true",
                   help="with --all: bench every shipped preset end-to-end "
                        "(SURVEY.md §6 config matrix) and write "
                        "bench_matrix.jsonl")
    p.add_argument("--train-scan", action="store_true",
                   help="with --all: probe train-step batch scaling with "
                        "remat on (speed/memory frontier)")
    p.add_argument("--dtype", choices=["preset", "f32", "bf16"], default="preset",
                   help="network compute dtype (default: the preset's, bf16)")
    p.add_argument("--scale-scan", action="store_true",
                   help="with --all: measure flagship recon throughput "
                        "across image sizes / angle counts (SURVEY §5.7 "
                        "scaling question)")
    p.add_argument("--preset-recon", metavar="NAME",
                   help="bench ONE preset's end-to-end recon (a single "
                        "--matrix row) and exit; combine with --batch/--stem")
    p.add_argument("--stem", type=int, default=None,
                   help="with --preset-recon: override the model's "
                        "space-to-depth stem (README speed/quality ladder)")
    p.add_argument("--sparsity", type=int, default=None,
                   help="with --preset-recon: override the undersampling "
                        "factor (README quality-vs-acceleration matrix)")
    p.add_argument("--unet-scan", action="store_true",
                   help="time UNet upsample/stem variants and per-level "
                        "parts at the flagship shape; writes "
                        "artifacts/unet_scan.json and exits")
    args = p.parse_args(argv)
    # --matrix / --train-scan / --scale-scan are --all sub-modes; asking
    # for any implies --all rather than silently doing nothing
    args.all = args.all or args.matrix or args.train_scan or args.scale_scan

    import jax

    from pdunet_tpu.utils import enable_compilation_cache, watchdog

    enable_compilation_cache()
    # wedged-axon-RPC bound (see train.py --watchdog-secs); each completed
    # bench row beats, so only a genuinely stuck compile/dispatch trips it
    import os

    watchdog.start(float(os.environ.get("PDUNET_WATCHDOG_SECS", 0)),
                   label="bench")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.unet_scan:
        scan = bench_unet_scan(batch=min(args.batch, 128),
                               image_size=args.image_size)
        import pathlib

        out = pathlib.Path(__file__).resolve().parent / "artifacts" / "unet_scan.json"
        out.write_text(json.dumps(scan, indent=2) + "\n")
        print(json.dumps(scan, indent=2))
        return 0

    if args.preset_recon:
        row = bench_preset_recon(args.preset_recon, args.batch,
                                 stem=args.stem, sparsity=args.sparsity)
        print(json.dumps(row))
        return 0

    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.training.tasks import build_task

    config = get_preset("pdunet_parallel")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=args.image_size, n_angles=360, sparsity=4
        ),
        model=dataclasses.replace(
            config.model,
            n_iters=args.n_iters,
            **(
                {}
                if args.dtype == "preset"
                else {"use_bfloat16": args.dtype == "bf16"}
            ),
        ),
        train=dataclasses.replace(config.train, batch_size=args.batch),
    )
    task = build_task(config)
    key = jax.random.PRNGKey(0)
    params = task.init_params(key)
    batch = task.make_batch(key)

    # carry the reconstruction back in as the next initial image: a real
    # data dependency, so the fori_loop times back-to-back reconstructions.
    # params/batch enter as closure constants — safe here because both are
    # compute-produced device arrays (init_params/make_batch jits), which
    # the axon relay can read back for HLO embedding; host-loaded arrays
    # must go through jit arguments instead (utils/device.py quirk list)
    dt = timeit(
        lambda f0: task.recon_fn(params, dict(batch, f0=f0)), batch["f0"]
    )
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
                   "dtype": args.dtype}}
        import jax.numpy as jnp

        from pdunet_tpu.geometry import build_parallel_plan

        _, sparse_geom = build_geometries(config.geometry)

        # Roofline readout: XLA's own FLOP count for the compiled recon ×
        # measured executions/sec vs the chip's bf16 MXU peak (v5e ≈ 197
        # TFLOP/s). "Speed of light" for this workload is NOT 100%: the
        # UNet stages at 256² with 32-64 features are batch/spatial-large
        # but channel-thin, and the projector matmuls are (A·S_ext, N)-
        # shaped — both leave lanes idle relative to a square-matmul peak.
        try:
            lowered = jax.jit(
                lambda f0: task.recon_fn(params, dict(batch, f0=f0))
            ).lower(batch["f0"])
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                achieved = flops / dt
                # Analytic FLOPs for the Pallas projector calls (XLA's
                # cost model scores custom calls at zero): per angle group
                # the factored pipeline is stage-1 2×(A_g·N²·K) MACs +
                # stage-2 4×(A_g·N·K) + stage-3 2×(A_g·K·S); the adjoint
                # transposes the same factors. 2 FLOP per MAC; the recon
                # runs n_iters forward+adjoint pairs.
                plan = build_parallel_plan(sparse_geom)
                m = plan.meta
                A_tot, N_, K_ = (m["A_x"] + m["A_y"]), m["N"], plan.spec.shape[0]
                S_ = plan.Wc.shape[1]
                # Mirror-pair kernels share stage 1 across angle pairs:
                # stage-1 units = pairs, stage-2/3 run per emitted row (2
                # per pair, unpaired members masked).
                if m.get("use_pairs"):
                    units1 = m["P_x"] + m["P_y"]
                    rows23 = 2 * units1
                else:
                    units1, rows23 = A_tot, A_tot
                per_apply = 2 * (
                    2 * units1 * N_ * N_ * K_
                    + 4 * rows23 * N_ * K_
                    + 2 * rows23 * K_ * S_
                )
                proj_flops_slice = 2 * args.n_iters * per_apply
                total_slice = flops / args.batch + proj_flops_slice
                achieved_total = total_slice * args.batch / dt
                details["roofline"] = {
                    "device_kind": jax.devices()[0].device_kind,
                    "peak_ref": "v5e bf16 MXU ~197 TFLOP/s",
                    "xla_flops_per_batch": flops,
                    "tflops_per_slice": round(flops / args.batch / 1e12, 6),
                    "achieved_tflops_per_sec": round(achieved / 1e12, 2),
                    "mxu_util_vs_bf16_peak": round(achieved / 197e12, 4),
                    # XLA's cost analysis reports ZERO flops for custom
                    # calls, so the Pallas projector kernels (~26 GFLOP/
                    # slice, ~53% of recon wall time; standalone A runs at
                    # ~50% of MXU peak) are excluded — this utilization
                    # figure covers the conv/UNet half only and is a strict
                    # lower bound on whole-recon MXU utilization.
                    # XLA scores custom calls at zero flops, so the
                    # conv-only figure above is a strict lower bound; the
                    # *_total fields add the analytic factored-projector
                    # flops for the 2·n_iters Pallas applies per recon.
                    "projector_tflops_per_slice_analytic": round(
                        proj_flops_slice / 1e12, 6),
                    "total_tflops_per_slice": round(total_slice / 1e12, 6),
                    "achieved_total_tflops_per_sec": round(
                        achieved_total / 1e12, 2),
                    "mxu_util_total_est": round(achieved_total / 197e12, 4),
                    "note": "conv-only figures exclude Pallas custom-call "
                            "flops (XLA cost_analysis reports 0); *_total "
                            "adds analytic projector flops",
                }
        except Exception as e:  # cost_analysis is best-effort per backend
            details["roofline"] = {"error": str(e)}

        # operator benches must run at the same compute dtype the headline
        # config uses — an f32 plan under a bf16 label misreports them
        op_dtype = (
            jnp.bfloat16 if config.model.use_bfloat16 else jnp.float32
        )
        ops = make_parallel_ops(sparse_geom, dtype=op_dtype)
        img = batch["image"]
        sino = batch["sino"]

        dt_a = timeit(ops.A, img)
        details["radon_fwd_slices_per_sec"] = round(args.batch / dt_a, 2)
        watchdog.beat()

        dt_at = timeit(ops.At, sino)
        details["radon_adj_slices_per_sec"] = round(args.batch / dt_at, 2)

        dt_f = timeit(ops.fbp, sino)
        details["fbp_slices_per_sec"] = round(args.batch / dt_f, 2)
        watchdog.beat()

        from pdunet_tpu.training.loop import make_train_step

        # the inference-saturating batch (256) OOMs the no-remat train step
        # (fwd + bwd activations); train throughput is reported at its own
        # batch — the shipped training batch sizes are far below this cap
        train_batch = min(args.batch, 32)
        if train_batch != args.batch:
            train_config = dataclasses.replace(
                config,
                train=dataclasses.replace(config.train, batch_size=train_batch),
            )
            train_task = build_task(train_config)
        else:
            train_task = task
        details["config"]["train_batch"] = train_batch
        step = make_train_step(train_task, donate=False)
        import optax
        from flax.training import train_state

        state = train_state.TrainState.create(
            apply_fn=None, params=train_task.init_params(key), tx=optax.adam(1e-3)
        )

        dt_t = time_train_steps(step, state, key)
        details["train_step_sec"] = round(dt_t, 4)
        details["train_slices_per_sec"] = round(train_batch / dt_t, 2)
        watchdog.beat()

        # fwd/bwd/opt attribution (VERDICT r3 next #3: publish the
        # train-step split): time forward-only and forward+grad programs
        # with the same on-device fori_loop methodology, difference out
        # the stages. Data synthesis runs inside every variant (as in the
        # real step), so it lands in "fwd".
        import jax.numpy as jnp
        from jax import lax

        def _timed_loop(body_fn, init):
            @jax.jit
            def loop(n, s):
                return jnp.real(jnp.ravel(
                    lax.fori_loop(0, n, body_fn, s))[0])

            float(loop(2, init))
            t0 = time.perf_counter()
            float(loop(0, init))
            base = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(5, init))
                best = min(best, time.perf_counter() - t0)
            return max(best - base, 1e-9) / 5

        def fwd_body(i, acc):
            b = train_task.make_batch(jax.random.fold_in(key, i))
            loss, _ = train_task.loss_fn(state.params, b)
            return acc + loss.astype(jnp.float32)

        def grad_body(i, acc):
            b = train_task.make_batch(jax.random.fold_in(key, i))
            (loss, _), grads = jax.value_and_grad(
                train_task.loss_fn, has_aux=True)(state.params, b)
            g0 = jnp.real(jnp.ravel(jax.tree_util.tree_leaves(grads)[0])[0])
            return acc + loss.astype(jnp.float32) + g0.astype(jnp.float32) * 1e-30

        try:
            t_fwd = _timed_loop(fwd_body, jnp.zeros(()))
            t_grad = _timed_loop(grad_body, jnp.zeros(()))
            details["train_split"] = {
                "batch": train_batch,
                "fwd_sec": round(t_fwd, 4),
                "bwd_sec": round(max(t_grad - t_fwd, 0.0), 4),
                "opt_sec": round(max(dt_t - t_grad, 0.0), 4),
                "note": "fwd includes in-jit data synthesis; bwd = "
                        "grad-minus-fwd; opt = full-step minus grad "
                        "(adam update + param write)",
            }
        except Exception as e:
            details["train_split"] = {"error": f"{type(e).__name__}: {e}"}

        if args.train_scan:
            # Speed/memory frontier (BASELINE.json:5): remat trades ~30%
            # step time for O(1)-in-unroll activation memory, unlocking
            # batches the no-remat step OOMs on; report the whole ladder.
            details["train_scan"] = []
            for b, use_remat in ((32, False), (64, True), (128, True),
                                 (256, True)):
                scan_config = dataclasses.replace(
                    config,
                    model=dataclasses.replace(config.model, remat=use_remat),
                    train=dataclasses.replace(config.train, batch_size=b),
                )
                try:
                    scan_task = build_task(scan_config)
                    s_step = make_train_step(scan_task, donate=False)
                    s_state = train_state.TrainState.create(
                        apply_fn=None, params=scan_task.init_params(key),
                        tx=optax.adam(1e-3),
                    )
                    s_dt = time_train_steps(s_step, s_state, key)
                    details["train_scan"].append({
                        "batch": b, "remat": use_remat,
                        "step_sec": round(s_dt, 4),
                        "slices_per_sec": round(b / s_dt, 2),
                    })
                except Exception as e:  # OOM at some batch: record and stop
                    details["train_scan"].append(
                        {"batch": b, "remat": use_remat,
                         "error": type(e).__name__})
                    break

        if args.scale_scan:
            # SURVEY §5.7 scaling question: recon cost is O(n_angles·N·K)
            # in the projector and O(N²·C) in the convs, so slices/s drops
            # superlinearly with N while Mpixel/s should stay near-flat
            # until a resource wall (VMEM tiling, HBM). Angles scale with N
            # (Nyquist: π/2·N for full view; the ladder keeps the shipped
            # 360-at-256² sparse-view ratio). Batch halves per octave to
            # bound activation memory.
            details["scale_scan"] = []
            for size, n_ang, b in ((128, 180, 512), (256, 360, 256),
                                   (384, 540, 128), (512, 720, 64)):
                try:
                    row = bench_preset_recon("pdunet_parallel", b,
                                             image_size=size, n_angles=n_ang)
                except Exception as e:
                    row = {"image_size": size, "n_angles": n_ang, "batch": b,
                           "error": f"{type(e).__name__}: {e}"}
                details["scale_scan"].append(row)
                watchdog.beat()
                print(json.dumps(row), file=sys.stderr)

        if args.matrix:
            # SURVEY.md §6: one end-to-end recon-throughput row per shipped
            # preset at its trained config, emitted as machine-checkable
            # JSONL (BASELINE.md contract).
            details["presets"] = []
            with open("bench_matrix.jsonl", "w") as mf:
                for name, b in MATRIX_BATCH.items():
                    try:
                        row = bench_preset_recon(name, b)
                    except Exception as e:
                        row = {"preset": name, "batch": b,
                               "error": f"{type(e).__name__}: {e}"}
                    details["presets"].append(row)
                    watchdog.beat()
                    mf.write(json.dumps(row) + "\n")
                    mf.flush()
                    print(json.dumps(row), file=sys.stderr)

        print(json.dumps(details, indent=2), file=sys.stderr)
        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
