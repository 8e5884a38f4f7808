"""Parallel-beam Radon forward / adjoint, TPU-native.

Replaces torch-radon's parallel-beam CUDA projectors (SURVEY.md §2b C1, §2c).
Two implementations:

* ``parallel_project`` / ``parallel_backproject`` — the production path: the
  factored matmul + grouped-conv pipeline described in
  :mod:`pdunet_tpu.geometry`. All FLOPs land on the MXU with static
  precomputed weights; no gathers, no scatters, no dynamic shapes. The pair
  is an exact transpose (machine-precision adjoint test).

* ``parallel_project_ref`` — a slow, simple ray-driven sampler (the numerical
  oracle; SURVEY.md §4.2 tier 1/3). Its exact adjoint is available through
  ``jax.linear_transpose`` for cross-checking.

Shapes: images ``(..., N, N)`` (row index j ↦ +y, column index i ↦ +x),
sinograms ``(..., A, S)``.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pdunet_tpu.geometry import ParallelGeometry, ParallelPlan, build_parallel_plan

__all__ = [
    "parallel_project",
    "parallel_backproject",
    "parallel_project_ref",
    "make_parallel_ops",
    "RadonOps",
]


# ---------------------------------------------------------------------------
# Production factored path
# ---------------------------------------------------------------------------


def _collapse_batch(x: jnp.ndarray, ndim_event: int):
    """Flatten all leading dims into one batch dim; return (x3, restore_fn)."""
    batch_shape = x.shape[: x.ndim - ndim_event]
    event_shape = x.shape[x.ndim - ndim_event:]
    xb = x.reshape((-1,) + event_shape)

    def restore(y: jnp.ndarray) -> jnp.ndarray:
        return y.reshape(batch_shape + y.shape[1:])

    return xb, restore


def _stage2_fwd(r: jnp.ndarray, Kf: jnp.ndarray, S: int) -> jnp.ndarray:
    """Shear-sum: r (B, A, N, S_ext), Kf (A, N, D) → p (B, A, S).

    Grouped valid correlation: each angle is its own group; the kernel spans
    the full row extent N (collapsing it) and D detector bins.
    """
    A, N, D = Kf.shape
    out = lax.conv_general_dilated(
        r,
        Kf.reshape(A, 1, N, D),
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=A,
    )
    return out.reshape(r.shape[0], A, S)


def _stage2_adj(p: jnp.ndarray, Ka: jnp.ndarray, S_ext: int, M: int) -> jnp.ndarray:
    """Transpose of ``_stage2_fwd``: p (B, A, S) → r̃ (B, A, N, S_ext)."""
    A, N, D = Ka.shape
    out = lax.conv_general_dilated(
        p.reshape(p.shape[0], A, 1, p.shape[-1]),
        Ka.reshape(A * N, 1, 1, D),
        window_strides=(1, 1),
        padding=((0, 0), (2 * M, 2 * M)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=A,
    )
    return out.reshape(p.shape[0], A, N, S_ext)


def parallel_project(plan: ParallelPlan, image: jnp.ndarray) -> jnp.ndarray:
    """Factored parallel-beam forward projection. image (..., N, N) → (..., A, S)."""
    meta = plan.meta
    S, M = meta["S"], meta["M"]
    f, restore = _collapse_batch(image, 2)
    parts = []
    if meta["A_x"]:
        r = jnp.einsum("bji,aiu->baju", f, plan.T_x)   # resample rows along x
        parts.append(_stage2_fwd(r, plan.Kf_x, S))
    if meta["A_y"]:
        r = jnp.einsum("bji,aju->baiu", f, plan.T_y)   # resample columns along y
        parts.append(_stage2_fwd(r, plan.Kf_y, S))
    p = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    p = jnp.take(p, jnp.asarray(meta["inv_perm"]), axis=1)
    return restore(p)


def parallel_backproject(plan: ParallelPlan, sino: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of :func:`parallel_project`. sino (..., A, S) → (..., N, N)."""
    meta = plan.meta
    S_ext, M, N = meta["S_ext"], meta["M"], meta["N"]
    p, restore = _collapse_batch(sino, 2)
    f = jnp.zeros((p.shape[0], N, N), p.dtype)
    if meta["A_x"]:
        px = jnp.take(p, jnp.asarray(meta["idx_x"]), axis=1)
        rt = _stage2_adj(px, plan.Ka_x, S_ext, M)
        f = f + jnp.einsum("baju,aiu->bji", rt, plan.T_x)
    if meta["A_y"]:
        py = jnp.take(p, jnp.asarray(meta["idx_y"]), axis=1)
        rt = _stage2_adj(py, plan.Ka_y, S_ext, M)
        f = f + jnp.einsum("baiu,aju->bji", rt, plan.T_y)
    return restore(f)


# ---------------------------------------------------------------------------
# Ray-driven reference twin (oracle)
# ---------------------------------------------------------------------------


def _bilinear_sample(image: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample image (N, N) at fractional array coords; zero outside."""
    N = image.shape[-1]
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, w):
        valid = (xi >= 0) & (xi < N) & (yi >= 0) & (yi < N)
        v = image[jnp.clip(yi, 0, N - 1), jnp.clip(xi, 0, N - 1)]
        return jnp.where(valid, v, 0.0) * w

    return (
        tap(y0i, x0i, (1 - fx) * (1 - fy))
        + tap(y0i, x0i + 1, fx * (1 - fy))
        + tap(y0i + 1, x0i, (1 - fx) * fy)
        + tap(y0i + 1, x0i + 1, fx * fy)
    )


def parallel_project_ref(
    geom: ParallelGeometry, image: jnp.ndarray, oversample: int = 2
) -> jnp.ndarray:
    """Ray-driven line-integral oracle. image (N, N) → sinogram (A, S).

    Samples each ray uniformly with step ``pixel_spacing / oversample`` and
    bilinear interpolation — the same discretization family as torch-radon's
    texture sampler, kept simple for verifiability.
    """
    N = geom.image_size
    dp, ds = geom.pixel_spacing, geom.det_spacing
    S = geom.det_count
    angles = jnp.asarray(geom.angles)
    c = (N - 1) / 2.0
    s_coords = (jnp.arange(S) - (S - 1) / 2.0) * ds
    half_len = N * dp * math.sqrt(2.0) / 2.0
    n_t = int(2 * half_len / (dp / oversample)) + 1
    t = jnp.linspace(-half_len, half_len, n_t)
    dt = float(t[1] - t[0]) if n_t > 1 else 1.0

    def one_angle(theta):
        cs, sn = jnp.cos(theta), jnp.sin(theta)
        # ray point = s*ω + t*ω⊥, ω = (cosθ, sinθ)
        x = s_coords[:, None] * cs - t[None, :] * sn
        y = s_coords[:, None] * sn + t[None, :] * cs
        vals = _bilinear_sample(image, x / dp + c, y / dp + c)
        return vals.sum(axis=-1) * dt

    return lax.map(one_angle, angles)


# ---------------------------------------------------------------------------
# Operator bundle with custom_vjp adjoint pairing
# ---------------------------------------------------------------------------


class RadonOps(NamedTuple):
    """Differentiable operator bundle handed to models (SURVEY.md §1a: models
    hold operator handles, never geometry internals)."""

    A: Callable[[jnp.ndarray], jnp.ndarray]        # image → sinogram
    At: Callable[[jnp.ndarray], jnp.ndarray]       # sinogram → image (adjoint)
    fbp: Callable[..., jnp.ndarray]                # sinogram → image (filtered)
    geom: object
    image_shape: tuple
    sino_shape: tuple


def make_parallel_ops(geom: ParallelGeometry, dtype=jnp.float32) -> RadonOps:
    """Build the differentiable parallel-beam operator bundle for ``geom``.

    ``vjp(A) = At`` and ``vjp(At) = A`` exactly (the factored stages are
    transposed weight-for-weight), replacing torch-radon's autograd Function
    pairing (SURVEY.md §2c).
    """
    from pdunet_tpu.ops.radon.filtering import filter_sinogram

    plan = build_parallel_plan(geom, dtype=dtype)

    @jax.custom_vjp
    def A(f):
        return parallel_project(plan, f)

    def A_fwd(f):
        return A(f), None

    def A_bwd(_, g):
        return (parallel_backproject(plan, g),)

    A.defvjp(A_fwd, A_bwd)

    @jax.custom_vjp
    def At(p):
        return parallel_backproject(plan, p)

    def At_fwd(p):
        return At(p), None

    def At_bwd(_, g):
        return (parallel_project(plan, g),)

    At.defvjp(At_fwd, At_bwd)

    n_angles = len(geom.angles)
    # FBP scale: continuous f = ∫_0^π (p ⊛ ramp) dθ ≈ (π/A)·Σ_a BP_a, and
    # At carries the δ_p²/δ_s mass factor of the forward model, so the
    # interpolation-weight backprojection is At · δ_s/δ_p².
    bp_scale = math.pi / n_angles * geom.det_spacing / (geom.pixel_spacing ** 2)

    def fbp(p, filter_name: str = "ramp"):
        return bp_scale * At(filter_sinogram(p, geom.det_spacing, filter_name))

    return RadonOps(
        A=A,
        At=At,
        fbp=fbp,
        geom=geom,
        image_shape=(geom.image_size, geom.image_size),
        sino_shape=(n_angles, geom.det_count),
    )
