"""Mesh construction and batch-sharded training steps.

Replaces the reference's (optional, unconfigured) Lightning DDP/NCCL path
(SURVEY.md §2d) with jax.sharding: params replicated, batch sharded over the
``data`` mesh axis, gradient all-reduce emitted by XLA over ICI.

Works identically on a real v5e-8 and on a CPU mesh forced with
``--xla_force_host_platform_device_count=8`` (how CI exercises it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_batch_spec", "make_sharded_train_step"]


def make_mesh(
    n_devices: Optional[int] = None, axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    By default all devices land on the first axis and the rest get size 1
    (the ``angle``/``model`` axes exist for composition, unused by default).
    Pass ``shape`` for a true multi-axis mesh, e.g.
    ``make_mesh(8, axes=("data", "angle"), shape=(4, 2))`` to compose batch
    data-parallelism with angle-axis operator sharding (SURVEY.md §5.7).
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    else:
        shape = tuple(shape)
        if int(np.prod(shape)) != n:
            raise ValueError(f"mesh shape {shape} needs {np.prod(shape)} "
                             f"devices, have {n}")
    return Mesh(np.array(devices[:n]).reshape(shape), axes)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_spec(batch_example, mesh: Mesh, axis: str = "data"):
    """NamedShardings sharding the leading (batch) dim of every leaf."""

    def spec(x):
        return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))

    return jax.tree_util.tree_map(spec, batch_example)


def make_sharded_train_step(
    task, mesh: Mesh, axis: str = "data", donate: bool = True,
    from_images: bool = False,
):
    """Batch-data-parallel version of ``loop.make_train_step``.

    The batch is synthesized (or, with ``from_images``, the host-loaded
    ground-truth slices are corrupted/projected) *inside* the jit and
    constrained to the data axis, so each chip computes only its shard;
    the gradient all-reduce is inserted by XLA (psum over ICI). State
    lives replicated.
    """
    import optax
    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())

    def constrain(batch):
        def c(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, PartitionSpec(axis, *([None] * (x.ndim - 1))))
            )

        return jax.tree_util.tree_map(c, batch)

    def _update(state, batch):
        def loss_of(params):
            return task.loss_fn(params, batch)

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return state, metrics

    if from_images:
        def step(state, key, images):
            return _update(state, constrain(task.batch_from_images(images, key)))
    else:
        def step(state, key):
            return _update(state, constrain(task.make_batch(key)))

    return jax.jit(
        step,
        donate_argnums=(0,) if donate else (),
        out_shardings=(repl, repl),
    )
