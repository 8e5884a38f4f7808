"""The jitted training loop (SURVEY.md §3.1 build mapping).

The reference's Lightning ``training_step`` + DataLoader workers + autograd
+ Adam step collapse into ONE jitted function: batch synthesis happens on
device, the unrolled model runs under scan/remat, gradients flow through the
operators' custom_vjp, and optax updates in place (donated buffers). The
only host work per step is the scalar metrics fetch on log steps.
"""

from __future__ import annotations

import json
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pdunet_tpu.configs import ExperimentConfig
from pdunet_tpu.ops.metrics import psnr, ssim
from pdunet_tpu.training.tasks import Task, build_task
from pdunet_tpu.utils import watchdog

__all__ = ["train", "TrainResult", "make_train_step", "build_state"]


class TrainResult(NamedTuple):
    state: Any
    history: list
    final_eval: dict
    task: Task


def _make_schedule(tc, n_steps=None):
    """Warmup-cosine over the *actual* run length: ``n_steps`` (the resolved
    loop length, which --steps may override) wins over ``tc.steps`` so short
    runs still decay and long runs don't flatline at end_value."""
    decay_steps = tc.steps if n_steps is None else n_steps
    if tc.warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=tc.learning_rate,
            warmup_steps=tc.warmup_steps,
            decay_steps=max(decay_steps, tc.warmup_steps + 1),
            end_value=tc.learning_rate * 0.01,
        )
    return tc.learning_rate


def build_state(task: Task, params=None, init_key=None, n_steps=None):
    """TrainState with the exact optimizer tree used in training — the
    single source of truth for checkpoint templates (orbax restore needs a
    structurally identical pytree)."""
    tc = task.config.train
    if params is None:
        params = task.init_params(init_key if init_key is not None else jax.random.PRNGKey(0))
    tx = optax.adam(_make_schedule(tc, n_steps))
    if getattr(tc, "grad_clip", 0.0) > 0:
        tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), tx)
    return train_state.TrainState.create(
        apply_fn=getattr(task.model, "apply", None), params=params, tx=tx
    )


#: checkify error set for the sanitizer mode (SURVEY.md §5.2): NaN/Inf in
#: any intermediate plus out-of-bounds indexing inside ops. The reference
#: stack has no analogue (single-stream CUDA via torch); this is the
#: functional-JAX equivalent of running under a sanitizer.
def _checkify_errors():
    from jax.experimental import checkify

    return checkify.index_checks | checkify.float_checks


def make_train_step(task: Task, donate: bool = True, from_images: bool = False,
                    checked: bool = False):
    """Build the single jitted train step.

    Synthetic mode: (state, key) → (state, metrics) — the batch is
    synthesized on device inside the jit.
    File-backed mode (``from_images``): (state, key, images) → same, where
    ``images`` are host-loaded ground-truth slices and the task's
    measurement synthesis + training corruption run inside the jit
    (SURVEY.md §3.1: the DataLoader-worker boundary carries only images).
    ``checked``: wrap the step in ``checkify`` (NaN/Inf + index bounds);
    the returned fn then yields ``(err, (state, metrics))`` and the caller
    must ``err.throw()``.
    """

    def _update(state, batch):
        def loss_of(params):
            return task.loss_fn(params, batch)

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        gnorm = optax.global_norm(grads)
        return state, {"loss": loss, "grad_norm": gnorm, **aux}

    if from_images:
        def step(state, key, images):
            return _update(state, task.batch_from_images(images, key))
    else:
        def step(state, key):
            return _update(state, task.make_batch(key))

    if checked:
        from jax.experimental import checkify

        step = checkify.checkify(step, errors=_checkify_errors())
        # donation is off in checked mode: checkify's error-state plumbing
        # aliases inputs in ways that fight buffer donation
        return jax.jit(step)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(task: Task):
    def evaluate(params, batch):
        recon = task.recon_fn(params, batch)
        return {
            "psnr": jnp.mean(psnr(recon, batch["image"])),
            "ssim": jnp.mean(ssim(recon, batch["image"])),
        }

    return jax.jit(evaluate)


def train(
    config: ExperimentConfig,
    steps: Optional[int] = None,
    fixed_data: bool = False,
    metrics_path: Optional[str] = None,
    verbose: bool = True,
    n_devices: Optional[int] = None,
    angle_devices: Optional[int] = None,
    profile_dir: Optional[str] = None,
    tb_dir: Optional[str] = None,
    data: Optional[str] = None,
    split: str = "train",
    checked: bool = False,
) -> TrainResult:
    """Train one experiment preset end-to-end.

    ``fixed_data=True`` reuses a single synthesized batch every step (the
    overfit smoke-test mode of SURVEY.md §4.2 tier 5).
    ``n_devices``: >1 shards the batch over a data-parallel mesh (XLA psum
    over ICI; SURVEY.md §2d). ``angle_devices``: >1 additionally shards the
    physics operators' angle axis over that many devices (all three
    geometries; the beyond-HBM axis of SURVEY.md §5.7) — the mesh becomes
    (data=n_devices, angle=angle_devices) over n_devices·angle_devices
    chips. ``profile_dir``: capture a jax.profiler trace
    of steps 10-15 (SURVEY.md §5.1).
    ``data``: HDF5 slice dataset path — train from file-backed ground truth
    (host prefetch thread feeds image batches; measurement synthesis + the
    task's training corruption run inside the jitted step). Validation uses
    the dataset's ``val`` split, noiselessly.
    ``checked``: run the step under ``checkify`` (NaN/Inf + index-bounds
    sanitizer, SURVEY.md §5.2); raises on the step where a check fires.
    """
    tc = config.train
    n_steps = tc.steps if steps is None else steps

    mesh = None
    D = n_devices if n_devices else 1
    G = angle_devices if angle_devices else 1
    if D > 1 or G > 1:
        from pdunet_tpu.parallel import make_mesh

        if tc.batch_size % D:
            raise ValueError(
                f"batch_size {tc.batch_size} not divisible by {D} devices"
            )
        mesh = make_mesh(D * G, axes=("data", "angle"), shape=(D, G))

    if G > 1:
        task = build_task(config, mesh=mesh, batch_axis="data")
    else:
        task = build_task(config)

    key = jax.random.PRNGKey(tc.seed)
    key, init_key, data_key, val_key = jax.random.split(key, 4)

    prefetcher = None
    val_images = None
    if data is not None:
        if fixed_data:
            raise ValueError("fixed_data and data= are mutually exclusive")
        import numpy as np

        from pdunet_tpu.data.datasets import SliceDataset, iterate_batches
        from pdunet_tpu.data.native import HostPrefetcher

        train_ds = SliceDataset(data, split=split)
        if train_ds.image_size != config.geometry.image_size:
            raise ValueError(
                f"dataset slices are {train_ds.image_size}² but config expects "
                f"{config.geometry.image_size}²"
            )
        if len(train_ds) < tc.batch_size:
            # iterate_batches(drop_remainder=True) would never yield and
            # the prefetcher would spin forever with no diagnostic
            raise ValueError(
                f"{split!r} split has {len(train_ds)} slices < batch_size "
                f"{tc.batch_size}"
            )

        def _host_images(batch_np):
            # complex64 cannot cross host→device on axon: ship (re, im)
            if np.iscomplexobj(batch_np):
                return (
                    np.ascontiguousarray(batch_np.real, np.float32),
                    np.ascontiguousarray(batch_np.imag, np.float32),
                )
            return np.ascontiguousarray(batch_np, np.float32)

        batch_iter = iterate_batches(
            train_ds, tc.batch_size, shuffle=True, seed=tc.seed
        )
        prefetcher = HostPrefetcher(
            lambda _i: _host_images(next(batch_iter)), depth=2
        )
        n_val_batches = max(1, -(-tc.val_slices // tc.batch_size))
        # a read error here must propagate: silently falling back to the
        # train batch would make best-ckpt selection score on training data
        # for the whole run with no diagnostic
        val_ds = SliceDataset(data, split="val")
        try:
            if len(val_ds) >= tc.batch_size:
                it = iterate_batches(val_ds, tc.batch_size, shuffle=False)
                val_images = [
                    _host_images(b)
                    for b, _ in zip(it, range(
                        min(n_val_batches, len(val_ds) // tc.batch_size)))
                ]
        finally:
            val_ds.close()
        if val_images is None:  # tiny datasets: validate on the first batch
            val_images = [_host_images(
                next(iterate_batches(train_ds, tc.batch_size, shuffle=False))
            )]

    state = build_state(task, init_key=init_key, n_steps=n_steps)

    if mesh is not None:
        from pdunet_tpu.parallel import replicate

        state = replicate(state, mesh)

    ckpt_mgr = None
    best_mgr = None
    start_step = 0
    best_psnr = float("-inf")
    best_step = -1
    if tc.ckpt_dir:
        import os

        from pdunet_tpu.training.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(
            tc.ckpt_dir, max_to_keep=tc.max_checkpoints,
            save_interval_steps=tc.ckpt_every,
        )
        # Best-val weights survive keep-N rotation in their own single-slot
        # manager (reference parity: Lightning checkpoint-on-best retains
        # the best weights, not just metadata). infer.py --ckpt best loads it.
        best_mgr = CheckpointManager(
            os.path.join(tc.ckpt_dir, "best"), max_to_keep=1,
            save_interval_steps=1,
        )
        latest = ckpt_mgr.latest_step()
        if latest is not None:
            state = ckpt_mgr.restore(state)
            start_step = int(state.step)
            if verbose:
                print(f"[train] resumed from step {start_step}")
        import pathlib

        best_json = pathlib.Path(tc.ckpt_dir, "best.json")
        if best_json.exists():
            if best_mgr.latest_step() is not None:
                # resumed runs keep the historical best instead of
                # clobbering it
                prev = json.loads(best_json.read_text())
                best_psnr, best_step = prev["psnr"], prev["step"]
            # else: stale metadata without the weight slot (pre-best-manager
            # run, or best/ was cleaned) — start best tracking fresh so a
            # new best actually gets saved

    from_images = prefetcher is not None
    if mesh is not None:
        if checked:
            raise ValueError("checked mode is single-device (debug tool)")
        from pdunet_tpu.parallel import make_sharded_train_step

        step_fn = make_sharded_train_step(task, mesh, from_images=from_images)
    else:
        step_fn = make_train_step(task, from_images=from_images, checked=checked)
    eval_fn = make_eval_step(task)
    # Fixed validation set of ≥ tc.val_slices held-out slices, as several
    # whole batches (the eval step is compiled once at the training batch
    # shape). Best-ckpt selection averages over all of them.
    if from_images:
        val_batches = [task.batch_from_images(v) for v in val_images]  # noiseless
    else:
        n_val_batches = max(1, -(-tc.val_slices // tc.batch_size))
        val_batches = [
            task.make_batch(jax.random.fold_in(val_key, j))
            for j in range(n_val_batches)
        ]

    def run_eval(params):
        sums = {}
        for b in val_batches:
            for k, v in eval_fn(params, b).items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return {k: v / len(val_batches) for k, v in sums.items()}

    history = []
    tb_writer = None
    if tb_dir:
        # clu metric_writers → TensorBoard events (SURVEY.md §5.5; the
        # reference logged scalars via Lightning's TB logger)
        from clu import metric_writers

        tb_writer = metric_writers.create_default_writer(tb_dir)
    mfile = open(metrics_path, "a") if metrics_path else None
    t0 = time.perf_counter()
    profiling = False
    for i in range(start_step, n_steps):
        if profile_dir and i == start_step + 10:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        if profiling and i == start_step + 15:
            jax.profiler.stop_trace()
            profiling = False
        if fixed_data:
            step_key = jax.random.fold_in(data_key, 0)
        else:
            step_key = jax.random.fold_in(data_key, i)
        if from_images:
            out = step_fn(state, step_key, next(prefetcher))
        else:
            out = step_fn(state, step_key)
        if checked:
            err, out = out
            err.throw()  # surfaces the failing check with its step context
        state, metrics = out
        # progress heartbeat: dispatch is async, but a wedged axon compile
        # RPC blocks the first step_fn call and a mid-run wedge blocks the
        # next log-step fetch, so per-iteration beats catch both
        watchdog.beat()

        if (i + 1) % tc.log_every == 0 or i == n_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=i + 1, wall_s=round(time.perf_counter() - t0, 2))
            history.append(m)
            if verbose:
                print(f"[train] {json.dumps(m)}")
            if mfile:
                mfile.write(json.dumps(m) + "\n")
                mfile.flush()
            if tb_writer:
                tb_writer.write_scalars(
                    i + 1, {k: v for k, v in m.items() if k not in ("step",)}
                )
        if (i + 1) % tc.eval_every == 0 and not fixed_data:
            ev = run_eval(state.params)
            if verbose:
                print(f"[eval]  step {i + 1}: {json.dumps(ev)}")
            if mfile:
                mfile.write(json.dumps({"step": i + 1, **ev}) + "\n")
                mfile.flush()
            if tb_writer:
                tb_writer.write_scalars(
                    i + 1, {f"val_{k}": v for k, v in ev.items()}
                )
            # best-val tracking (reference: Lightning checkpoint-on-best)
            if ev["psnr"] > best_psnr:
                best_psnr = ev["psnr"]
                best_step = i + 1
                if best_mgr is not None:
                    import pathlib

                    best_mgr.save(best_step, state, force=True)
                    pathlib.Path(tc.ckpt_dir, "best.json").write_text(
                        json.dumps({"step": best_step, "psnr": best_psnr})
                    )
        if ckpt_mgr is not None:
            ckpt_mgr.save(i + 1, state)

    if profiling:
        jax.profiler.stop_trace()
    if prefetcher is not None:
        prefetcher.close()
        train_ds.close()
    if fixed_data:
        eval_batch = task.make_batch(jax.random.fold_in(data_key, 0))
        final_eval = {
            k: float(v) for k, v in eval_fn(state.params, eval_batch).items()
        }
    else:
        final_eval = run_eval(state.params)
    if ckpt_mgr is not None:
        if ckpt_mgr.latest_step() != n_steps:
            ckpt_mgr.save(n_steps, state, force=True)
        ckpt_mgr.wait()
        ckpt_mgr.close()
    if best_mgr is not None:
        best_mgr.wait()
        best_mgr.close()
    if mfile:
        mfile.close()
    if tb_writer:
        tb_writer.flush()
    return TrainResult(state, history, final_eval, task)
