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
    return train_state.TrainState.create(
        apply_fn=getattr(task.model, "apply", None), params=params, tx=tx
    )


def make_train_step(task: Task, donate: bool = True):
    """Build the single jitted train step: (state, key) → (state, metrics)."""

    def step(state, key):
        batch = task.make_batch(key)

        def loss_of(params):
            return task.loss_fn(params, batch)

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}
        return state, metrics

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
    profile_dir: Optional[str] = None,
    tb_dir: Optional[str] = None,
) -> TrainResult:
    """Train one experiment preset end-to-end.

    ``fixed_data=True`` reuses a single synthesized batch every step (the
    overfit smoke-test mode of SURVEY.md §4.2 tier 5).
    ``n_devices``: >1 shards the batch over a data-parallel mesh (XLA psum
    over ICI; SURVEY.md §2d). ``profile_dir``: capture a jax.profiler trace
    of steps 10-15 (SURVEY.md §5.1).
    """
    tc = config.train
    n_steps = tc.steps if steps is None else steps
    task = build_task(config)

    key = jax.random.PRNGKey(tc.seed)
    key, init_key, data_key, val_key = jax.random.split(key, 4)

    state = build_state(task, init_key=init_key, n_steps=n_steps)

    mesh = None
    if n_devices is not None and n_devices > 1:
        from pdunet_tpu.parallel import make_mesh, replicate

        if tc.batch_size % n_devices:
            raise ValueError(
                f"batch_size {tc.batch_size} not divisible by {n_devices} devices"
            )
        mesh = make_mesh(n_devices)
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
            # resumed runs keep the historical best instead of clobbering it
            prev = json.loads(best_json.read_text())
            best_psnr, best_step = prev["psnr"], prev["step"]

    if mesh is not None:
        from pdunet_tpu.parallel import make_sharded_train_step

        step_fn = make_sharded_train_step(task, mesh)
    else:
        step_fn = make_train_step(task)
    eval_fn = make_eval_step(task)
    val_batch = task.make_batch(val_key)

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
        state, metrics = step_fn(state, step_key)

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
            ev = {k: float(v) for k, v in eval_fn(state.params, val_batch).items()}
            if verbose:
                print(f"[eval]  step {i + 1}: {json.dumps(ev)}")
            if mfile:
                mfile.write(json.dumps({"step": i + 1, **ev}) + "\n")
                mfile.flush()
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
    eval_batch = val_batch if not fixed_data else task.make_batch(
        jax.random.fold_in(data_key, 0)
    )
    final_eval = {k: float(v) for k, v in eval_fn(state.params, eval_batch).items()}
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
