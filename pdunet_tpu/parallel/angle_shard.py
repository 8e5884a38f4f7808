"""Angle-axis sharding of the projector (SURVEY.md §5.7, §2d "SP/CP analogue").

The sinogram's angle dimension is the domain analogue of a sequence axis:
forward projection is angle-separable (each chip projects its own angle
shard — zero communication), and backprojection is a partial-sum per shard
followed by a ``psum`` over the ``angle`` mesh axis — structurally the same
ICI collective pattern as ring-attention's KV pass.

This is the beyond-single-chip-HBM scale axis for very large geometries;
batch data-parallelism (parallel/sharding.py) remains the primary axis.
Implementation: the plan's per-angle arrays (pos, shift) shard along their
leading axis under ``shard_map``; the footprint spectrum and inverse-DFT
matrices replicate. Restricted to single-group geometries (all angles
x-primary, i.e. |cosθ| ≥ √2/2 — e.g. limited-angle scans or per-group
invocation); the general two-group composition simply calls it per group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pdunet_tpu.geometry import ParallelPlan
from pdunet_tpu.ops.radon.parallel import _backproject_group, _project_group

__all__ = ["angle_sharded_project", "angle_sharded_backproject"]


def _single_group(plan: ParallelPlan):
    meta = plan.meta
    if meta["A_y"] != 0 or meta["A_x"] == 0:
        raise ValueError(
            "angle sharding operates on single-group plans (all angles "
            f"x-primary); got A_x={meta['A_x']}, A_y={meta['A_y']}"
        )
    return meta


def angle_sharded_project(
    plan: ParallelPlan, image: jnp.ndarray, mesh: Mesh, axis: str = "angle"
) -> jnp.ndarray:
    """Forward projection with angles sharded over ``axis``: no collectives
    (angle-separable); output sinogram is sharded along its angle dim."""
    meta = _single_group(plan)
    L = meta["S_ext"]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(), P(), P()),
        out_specs=P(None, axis, None),
    )
    def fwd(f, pos, shift, spec, Wc, Ws):
        return _project_group(f, pos, shift, spec, Wc, Ws, L, True)

    return fwd(image, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws)


def angle_sharded_backproject(
    plan: ParallelPlan, sino: jnp.ndarray, mesh: Mesh, axis: str = "angle"
) -> jnp.ndarray:
    """Adjoint with angles sharded: per-shard partial backprojection then a
    ``psum`` over the angle axis (the ICI all-reduce)."""
    meta = _single_group(plan)
    L = meta["S_ext"]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None), P(axis, None), P(), P(), P()),
        out_specs=P(),
    )
    def adj(p, pos, shift, spec, Wc, Ws):
        partial_img = _backproject_group(p, pos, shift, spec, Wc, Ws, L, True)
        return jax.lax.psum(partial_img, axis)

    return adj(sino, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws)