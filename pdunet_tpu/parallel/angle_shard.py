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

The per-shard group bodies route through the same ``impl`` switch as the
unsharded ops (ops/radon/parallel.py ``_resolve_impl``): fused Pallas
kernels on TPU, the einsum twin elsewhere — angle sharding costs no kernel
quality. ``make_parallel_ops(geom, mesh=...)`` packages all of this as a
drop-in differentiable operator bundle (the product path used by
``train.py --angle-devices``).

Mirror-pair plans (geometry.py ``pair_group``) shard along the PAIR axis
instead of the angle axis: each pair row is a self-contained unit (shared
stage-1 position + both members' shear rows), so the stage-1-sharing
speedup survives sharding — a contiguous split of raw angles would strand
θ and π−θ on different chips and forfeit it. Same padding + inverse-perm
reassembly, at half the stage-1 matmuls per shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pdunet_tpu.geometry import ParallelPlan
from pdunet_tpu.ops.radon.parallel import (
    _CDT,
    _backproject_group,
    _backproject_pair_group,
    _project_group,
    _project_pair_group,
    _resolve_impl,
)

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


def _pair_padded(arr: jnp.ndarray, n_shards: int, fill: float = 0.0) -> jnp.ndarray:
    """Pad the leading (pair) axis to a multiple of the shard count.

    A padded pair's forward rows are sliced off after reassembly; its
    adjoint contribution is zero because the matching sinogram rows are
    zero-padded (member a) and the mask pads to 0 (member b). ``sgn`` pads
    with 1.0 so padded rows stay on the well-defined +conj branch."""
    pad = (-arr.shape[0]) % n_shards
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)], axis=0
    )


def _group_fns(cdt, impl):
    """Per-shard group bodies honoring the impl switch (Pallas on TPU)."""
    if _resolve_impl(impl) == "pallas":
        from pdunet_tpu.ops.radon.pallas_kernels import (
            backproject_group_pallas,
            project_group_pallas,
        )

        bf16 = cdt == jnp.bfloat16
        fwd = lambda f, *a: project_group_pallas(f, *a, bf16=bf16)
        adj = lambda p, *a, N: backproject_group_pallas(p, *a, N, bf16=bf16)
    else:
        fwd = lambda f, *a: _project_group(f, *a, cdt=cdt)
        adj = lambda p, *a, N: _backproject_group(p, *a, cdt=cdt)
    return fwd, adj


def _pair_group_fns(cdt, impl):
    """Mirror-pair per-shard bodies honoring the impl switch."""
    if _resolve_impl(impl) == "pallas":
        from pdunet_tpu.ops.radon.pallas_kernels import (
            backproject_pair_group_pallas,
            project_pair_group_pallas,
        )

        bf16 = cdt == jnp.bfloat16
        fwd = lambda f, *a: project_pair_group_pallas(f, *a, bf16=bf16)
        adj = lambda p, *a, N: backproject_pair_group_pallas(p, *a, N, bf16=bf16)
    else:
        fwd = lambda f, *a: _project_pair_group(f, *a, cdt=cdt)
        # the einsum twin infers N from the plan rows
        adj = lambda p, *a, N: _backproject_pair_group(p, *a, cdt=cdt)
    return fwd, adj


def _project_pair_group_sharded(
    f, pos, sha, shb, sgn, spec, Wc, Ws, L, contract_x, mesh, axis,
    batch_axis=None, cdt=jnp.float32, impl=None,
):
    n_shards = mesh.shape[axis]
    P_g = pos.shape[0]
    pair_fwd, _ = _pair_group_fns(cdt, impl)

    @functools.partial(
        jax.shard_map,
        # check_vma=False: the static varying-mesh-axes checker cannot
        # annotate pallas_call out_shapes (ShapeDtypeStruct.vma is None ->
        # trace-time error on TPU), and these bodies manage their own
        # collectives (explicit psum in the adjoints, none in forward),
        # so the check adds nothing. Proven on-chip by
        # scripts/tpu_pallas_check.py's shard_map_pallas artifact entry.
        check_vma=False,
        mesh=mesh,
        in_specs=(P(batch_axis, None, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis), P(), P(), P()),
        out_specs=P(batch_axis, axis, None),
    )
    def fwd(f, pos, sha, shb, sgn, spec, Wc, Ws):
        return pair_fwd(f, pos, sha, shb, sgn, spec, Wc, Ws, L, contract_x)

    out = fwd(f, _pair_padded(pos, n_shards), _pair_padded(sha, n_shards),
              _pair_padded(shb, n_shards), _pair_padded(sgn, n_shards, 1.0),
              spec, Wc, Ws)
    return out[:, : 2 * P_g]


def _backproject_pair_group_sharded(
    p, pos, sha, shb, sgn, msk, spec, Wc, Ws, L, contract_x, mesh, axis,
    batch_axis=None, cdt=jnp.float32, impl=None, N=None,
):
    n_shards = mesh.shape[axis]
    _, pair_adj = _pair_group_fns(cdt, impl)

    @functools.partial(
        jax.shard_map,
        # check_vma=False: the static varying-mesh-axes checker cannot
        # annotate pallas_call out_shapes (ShapeDtypeStruct.vma is None ->
        # trace-time error on TPU), and these bodies manage their own
        # collectives (explicit psum in the adjoints, none in forward),
        # so the check adds nothing. Proven on-chip by
        # scripts/tpu_pallas_check.py's shard_map_pallas artifact entry.
        check_vma=False,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis), P(axis), P(), P(), P()),
        out_specs=P(batch_axis, None, None),
    )
    def adj(p, pos, sha, shb, sgn, msk, spec, Wc, Ws):
        partial_img = pair_adj(
            p, pos, sha, shb, sgn, msk, spec, Wc, Ws, L, contract_x, N=N)
        return jax.lax.psum(partial_img, axis)

    pad = 2 * ((-pos.shape[0]) % n_shards)
    if pad:
        p = jnp.concatenate(
            [p, jnp.zeros(p.shape[:1] + (pad,) + p.shape[2:], p.dtype)], axis=1
        )
    return adj(p, _pair_padded(pos, n_shards), _pair_padded(sha, n_shards),
               _pair_padded(shb, n_shards), _pair_padded(sgn, n_shards, 1.0),
               _pair_padded(msk, n_shards), spec, Wc, Ws)


def _project_group_sharded(
    f, pos, shift, spec, Wc, Ws, L, contract_x, mesh, axis, batch_axis=None,
    cdt=jnp.float32, impl=None,
):
    n_shards = mesh.shape[axis]
    A_g = pos.shape[0]
    group_fwd, _ = _group_fns(cdt, impl)

    @functools.partial(
        jax.shard_map,
        # check_vma=False: the static varying-mesh-axes checker cannot
        # annotate pallas_call out_shapes (ShapeDtypeStruct.vma is None ->
        # trace-time error on TPU), and these bodies manage their own
        # collectives (explicit psum in the adjoints, none in forward),
        # so the check adds nothing. Proven on-chip by
        # scripts/tpu_pallas_check.py's shard_map_pallas artifact entry.
        check_vma=False,
        mesh=mesh,
        in_specs=(P(batch_axis, None, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=P(batch_axis, axis, None),
    )
    def fwd(f, pos, shift, spec, Wc, Ws):
        return group_fwd(f, pos, shift, spec, Wc, Ws, L, contract_x)

    out = fwd(f, _padded(pos, n_shards), _padded(shift, n_shards), spec, Wc, Ws)
    return out[:, :A_g]


def _backproject_group_sharded(
    p, pos, shift, spec, Wc, Ws, L, contract_x, mesh, axis, batch_axis=None,
    cdt=jnp.float32, impl=None, N=None,
):
    n_shards = mesh.shape[axis]
    _, group_adj = _group_fns(cdt, impl)

    @functools.partial(
        jax.shard_map,
        # check_vma=False: the static varying-mesh-axes checker cannot
        # annotate pallas_call out_shapes (ShapeDtypeStruct.vma is None ->
        # trace-time error on TPU), and these bodies manage their own
        # collectives (explicit psum in the adjoints, none in forward),
        # so the check adds nothing. Proven on-chip by
        # scripts/tpu_pallas_check.py's shard_map_pallas artifact entry.
        check_vma=False,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=P(batch_axis, None, None),
    )
    def adj(p, pos, shift, spec, Wc, Ws):
        partial_img = group_adj(p, pos, shift, spec, Wc, Ws, L, contract_x, N=N)
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
    batch_axis: str | None = None, impl: str | None = None,
) -> jnp.ndarray:
    """Forward projection with angles sharded over ``axis``: no collectives
    (angle-separable). Both angle groups shard; outputs reassemble through
    the plan's inverse permutation. ``batch_axis`` additionally shards the
    leading image/batch dim over that mesh axis (2-D data x angle mesh)."""
    meta = plan.meta
    L = meta["S_ext"]
    cdt = _CDT[meta.get("compute_dtype", "float32")]
    f = image.astype(jnp.float32)
    if meta.get("use_pairs"):
        # shard the PAIR axis so the stage-1-sharing speedup survives
        parts = []
        if meta["P_x"]:
            parts.append(_project_pair_group_sharded(
                f, plan.pair_pos_x, plan.pair_sha_x, plan.pair_shb_x,
                plan.pair_sgn_x, plan.spec, plan.Wc, plan.Ws,
                L, True, mesh, axis, batch_axis, cdt, impl))
        if meta["P_y"]:
            parts.append(_project_pair_group_sharded(
                f, plan.pair_pos_y, plan.pair_sha_y, plan.pair_shb_y,
                plan.pair_sgn_y, plan.spec, plan.Wc, plan.Ws,
                L, False, mesh, axis, batch_axis, cdt, impl))
        p = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        p = jnp.take(p, jnp.asarray(meta["pair_inv_perm"]), axis=1)
        return p.astype(image.dtype)
    parts = []
    if meta["A_x"]:
        parts.append(_project_group_sharded(
            f, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws,
            L, True, mesh, axis, batch_axis, cdt, impl))
    if meta["A_y"]:
        parts.append(_project_group_sharded(
            f, plan.pos_y, plan.shift_y, plan.spec, plan.Wc, plan.Ws,
            L, False, mesh, axis, batch_axis, cdt, impl))
    p = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    p = jnp.take(p, jnp.asarray(meta["inv_perm"]), axis=1)
    return p.astype(image.dtype)


def angle_sharded_backproject(
    plan: ParallelPlan, sino: jnp.ndarray, mesh: Mesh, axis: str = "angle",
    batch_axis: str | None = None, impl: str | None = None,
) -> jnp.ndarray:
    """Adjoint with angles sharded: per-shard partial backprojection then a
    ``psum`` over the angle axis (the ICI all-reduce), per group. With
    ``batch_axis`` the batch dim stays sharded on that axis through the
    reduction (2-D data x angle mesh)."""
    meta = plan.meta
    N, L = meta["N"], meta["S_ext"]
    cdt = _CDT[meta.get("compute_dtype", "float32")]
    p_in = sino.astype(jnp.float32)
    if meta.get("use_pairs"):
        f = None
        if meta["P_x"]:
            px = jnp.take(p_in, jnp.asarray(meta["pair_take_x"]), axis=1)
            f = _backproject_pair_group_sharded(
                px, plan.pair_pos_x, plan.pair_sha_x, plan.pair_shb_x,
                plan.pair_sgn_x, plan.pair_msk_x, plan.spec, plan.Wc, plan.Ws,
                L, True, mesh, axis, batch_axis, cdt, impl, N=N)
        if meta["P_y"]:
            py = jnp.take(p_in, jnp.asarray(meta["pair_take_y"]), axis=1)
            fy = _backproject_pair_group_sharded(
                py, plan.pair_pos_y, plan.pair_sha_y, plan.pair_shb_y,
                plan.pair_sgn_y, plan.pair_msk_y, plan.spec, plan.Wc, plan.Ws,
                L, False, mesh, axis, batch_axis, cdt, impl, N=N)
            f = fy if f is None else f + fy
        return f.astype(sino.dtype)
    f = None
    if meta["A_x"]:
        px = jnp.take(p_in, jnp.asarray(meta["idx_x"]), axis=1)
        f = _backproject_group_sharded(
            px, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws,
            L, True, mesh, axis, batch_axis, cdt, impl, N=N)
    if meta["A_y"]:
        py = jnp.take(p_in, jnp.asarray(meta["idx_y"]), axis=1)
        fy = _backproject_group_sharded(
            py, plan.pos_y, plan.shift_y, plan.spec, plan.Wc, plan.Ws,
            L, False, mesh, axis, batch_axis, cdt, impl, N=N)
        f = fy if f is None else f + fy
    return f.astype(sino.dtype)


def angle_sharded_fbp(
    plan: ParallelPlan, sino: jnp.ndarray, mesh: Mesh, axis: str = "angle",
    filter_name: str = "ramp", batch_axis: str | None = None,
    impl: str | None = None,
) -> jnp.ndarray:
    """Filtered backprojection with the backprojection sharded over angles.

    The ramp filter is per-angle (angle-separable, runs replicated here —
    it is a detector-axis FFT, negligible next to the backprojection); the
    weighted adjoint shards and psums exactly like the training path."""
    import math

    from pdunet_tpu.ops.radon.filtering import filter_sinogram

    if plan.meta.get("spectral_selection"):
        raise ValueError(
            "angle_sharded_fbp got a spectral (fourier_slice) plan: its "
            "'detector' axis is [Re|Im] Fourier halves backed by a synthetic "
            "geometry, so ramp filtering / bp_scale would be nonsense. Use "
            "make_radial_ops(mesh=...).fbp for the radial DCF-adjoint recon."
        )
    geom = plan.geom
    bp_scale = (
        math.pi / len(geom.angles) * geom.det_spacing / (geom.pixel_spacing ** 2)
    )
    filtered = filter_sinogram(sino, geom.det_spacing, filter_name)
    return bp_scale * angle_sharded_backproject(
        plan, filtered, mesh, axis, batch_axis, impl)
