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
matrices replicate. General plans split angles into an x-primary and a
y-primary group (|cosθ| ≥ √2/2 vs the rest; see geometry.py): each group is
sharded independently — padded with zero rows up to a multiple of the mesh
axis — and the group outputs are reassembled with the plan's inverse
permutation, so any shipped geometry (full [0,π) scans included) shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pdunet_tpu.geometry import ParallelPlan
from pdunet_tpu.ops.radon.parallel import _backproject_group, _project_group

__all__ = [
    "angle_sharded_project",
    "angle_sharded_backproject",
    "angle_sharded_fbp",
]


def _padded(arr: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Zero-pad the leading (angle) axis to a multiple of the shard count.

    A padded angle row has pos = shift = 0: its forward output rows are
    sliced off, and its adjoint contribution is zero because the matching
    sinogram rows are zero-padded."""
    pad = (-arr.shape[0]) % n_shards
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0
    )


def _project_group_sharded(
    f, pos, shift, spec, Wc, Ws, L, contract_x, mesh, axis, batch_axis=None
):
    n_shards = mesh.shape[axis]
    A_g = pos.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(batch_axis, None, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=P(batch_axis, axis, None),
    )
    def fwd(f, pos, shift, spec, Wc, Ws):
        return _project_group(f, pos, shift, spec, Wc, Ws, L, contract_x)

    out = fwd(f, _padded(pos, n_shards), _padded(shift, n_shards), spec, Wc, Ws)
    return out[:, :A_g]


def _backproject_group_sharded(
    p, pos, shift, spec, Wc, Ws, L, contract_x, mesh, axis, batch_axis=None
):
    n_shards = mesh.shape[axis]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=P(batch_axis, None, None),
    )
    def adj(p, pos, shift, spec, Wc, Ws):
        partial_img = _backproject_group(p, pos, shift, spec, Wc, Ws, L, contract_x)
        # reduce only over the angle axis; the batch axis (if any) stays
        # sharded — this is the 2-D data x angle composition
        return jax.lax.psum(partial_img, axis)

    pad = (-p.shape[1]) % n_shards
    if pad:
        p = jnp.concatenate(
            [p, jnp.zeros(p.shape[:1] + (pad,) + p.shape[2:], p.dtype)], axis=1
        )
    return adj(p, _padded(pos, n_shards), _padded(shift, n_shards), spec, Wc, Ws)


def angle_sharded_project(
    plan: ParallelPlan, image: jnp.ndarray, mesh: Mesh, axis: str = "angle",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Forward projection with angles sharded over ``axis``: no collectives
    (angle-separable). Both angle groups shard; outputs reassemble through
    the plan's inverse permutation. ``batch_axis`` additionally shards the
    leading image/batch dim over that mesh axis (2-D data x angle mesh)."""
    meta = plan.meta
    L = meta["S_ext"]
    parts = []
    if meta["A_x"]:
        parts.append(_project_group_sharded(
            image, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws,
            L, True, mesh, axis, batch_axis))
    if meta["A_y"]:
        parts.append(_project_group_sharded(
            image, plan.pos_y, plan.shift_y, plan.spec, plan.Wc, plan.Ws,
            L, False, mesh, axis, batch_axis))
    p = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return jnp.take(p, jnp.asarray(meta["inv_perm"]), axis=1)


def angle_sharded_backproject(
    plan: ParallelPlan, sino: jnp.ndarray, mesh: Mesh, axis: str = "angle",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Adjoint with angles sharded: per-shard partial backprojection then a
    ``psum`` over the angle axis (the ICI all-reduce), per group. With
    ``batch_axis`` the batch dim stays sharded on that axis through the
    reduction (2-D data x angle mesh)."""
    meta = plan.meta
    L = meta["S_ext"]
    f = None
    if meta["A_x"]:
        px = jnp.take(sino, jnp.asarray(meta["idx_x"]), axis=1)
        f = _backproject_group_sharded(
            px, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws,
            L, True, mesh, axis, batch_axis)
    if meta["A_y"]:
        py = jnp.take(sino, jnp.asarray(meta["idx_y"]), axis=1)
        fy = _backproject_group_sharded(
            py, plan.pos_y, plan.shift_y, plan.spec, plan.Wc, plan.Ws,
            L, False, mesh, axis, batch_axis)
        f = fy if f is None else f + fy
    return f


def angle_sharded_fbp(
    plan: ParallelPlan, sino: jnp.ndarray, mesh: Mesh, axis: str = "angle",
    filter_name: str = "ramp", batch_axis: str | None = None,
) -> jnp.ndarray:
    """Filtered backprojection with the backprojection sharded over angles.

    The ramp filter is per-angle (angle-separable, runs replicated here —
    it is a detector-axis FFT, negligible next to the backprojection); the
    weighted adjoint shards and psums exactly like the training path."""
    import math

    from pdunet_tpu.ops.radon.filtering import filter_sinogram

    geom = plan.geom
    bp_scale = (
        math.pi / len(geom.angles) * geom.det_spacing / (geom.pixel_spacing ** 2)
    )
    filtered = filter_sinogram(sino, geom.det_spacing, filter_name)
    return bp_scale * angle_sharded_backproject(
        plan, filtered, mesh, axis, batch_axis)
