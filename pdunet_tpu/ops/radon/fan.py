"""Fan-beam Radon forward / adjoint / FBP via exact rebinning composition.

Replaces torch-radon's ``RadonFanbeam`` CUDA kernels (SURVEY.md §2b C1, §2c
"fan_fwd / fan_adj"). TPU-native design: a fan ray and a parallel ray are the
*same line* under

    p_fan(β, γ) = p_par(θ = β + γ,  s = R·sinγ),      tanγ = u / (R + D),

so the fan operator factors into the MXU-friendly parallel projector
(:mod:`pdunet_tpu.ops.radon.parallel`) sandwiched between *static* 4-tap
bilinear rebinning maps:

    A_fan  = Rebin_{par→fan} ∘ A_par            (forward)
    A_fan† = A_par† ∘ Rebin_{par→fan}†          (exact transpose, custom_vjp)
    FBP_fan = FBP_par ∘ Rebin_{fan→par}         (rebinning FBP — classical)

The rebinning tap indices/weights are precomputed in NumPy at plan-build
time (they depend only on geometry), applied as flat gathers of a few
hundred thousand taps — negligible next to the parallel matmuls. Parallel
sinogram periodicity p(θ+π, s) = p(θ, −s) is honored tap-by-tap, so
wrap-around angles flip the detector axis correctly. Limited-angle fan
coverage simply zeroes the taps of unmeasured rays (missing-data behavior
falls out of the model instead of being special-cased).

Geometry conventions (:class:`pdunet_tpu.geometry.FanGeometry`): source at
S(β) = (R sinβ, −R cosβ), flat detector through (−D sinβ, D cosβ) with
coordinate axis e_u = (cosβ, sinβ); the central ray (γ=0) hits u=0.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pdunet_tpu.geometry import FanGeometry, ParallelGeometry, build_parallel_plan
from pdunet_tpu.ops.radon.parallel import (
    RadonOps,
    _collapse_batch,
    parallel_backproject,
    parallel_project,
)

__all__ = ["FanPlan", "build_fan_plan", "fan_project", "fan_backproject", "make_fan_ops"]


class _RebinMap(NamedTuple):
    """Static 4-tap gather: out[i] = Σ_t src_flat[idx[i, t]] · w[i, t]."""

    idx: jnp.ndarray  # (n_out, 4) int32 into the flattened source grid
    w: jnp.ndarray    # (n_out, 4) float32
    out_shape: tuple
    src_shape: tuple


@jax.tree_util.register_pytree_node_class
class FanPlan:
    def __init__(self, geom, par_plan, fan_from_par, par_from_fan):
        self.geom = geom
        self.par_plan = par_plan
        self.fan_from_par = fan_from_par
        self.par_from_fan = par_from_fan

    def tree_flatten(self):
        maps = (
            self.par_plan,
            self.fan_from_par.idx, self.fan_from_par.w,
            self.par_from_fan.idx, self.par_from_fan.w,
        )
        aux = (
            self.geom,
            self.fan_from_par.out_shape, self.fan_from_par.src_shape,
            self.par_from_fan.out_shape, self.par_from_fan.src_shape,
        )
        return maps, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        geom, ffp_out, ffp_src, pff_out, pff_src = aux
        par_plan, ffp_idx, ffp_w, pff_idx, pff_w = children
        return cls(
            geom,
            par_plan,
            _RebinMap(ffp_idx, ffp_w, ffp_out, ffp_src),
            _RebinMap(pff_idx, pff_w, pff_out, pff_src),
        )


def _bilinear_taps(
    ang: np.ndarray,            # requested angle coords (radians, any real)
    s: np.ndarray,              # requested detector coords (same shape)
    n_ang: int,                 # source angle-grid size
    S: int,                     # source detector-grid size
    ds: float,                  # detector spacing
    mode: str,                  # 'parallel' | 'beta'
    ang_range: float = math.pi, # beta mode: grid covers [0, ang_range)
    valid: np.ndarray | None = None,
):
    """Static 4-tap bilinear interp taps on an (angle × detector) grid.

    mode='parallel': grid is θ over [0, π); requests reduce mod 2π and use
    the sinogram symmetry p(θ+π, s) = p(θ, −s) — including taps whose θ
    neighbour wraps across π (those flip the detector axis tap-by-tap).

    mode='beta': grid is β over [0, ang_range); periodic iff the range is a
    full circle, otherwise out-of-range taps get zero weight (limited-angle
    missing data).
    """
    s = np.array(s, np.float64)
    if mode == "parallel":
        dth = math.pi / n_ang
        th = np.mod(ang, 2.0 * math.pi)
        over = th >= math.pi
        th = np.where(over, th - math.pi, th)
        s = np.where(over, -s, s)
    else:
        dth = ang_range / n_ang
        full = abs(ang_range - 2.0 * math.pi) < 1e-9
        th = np.mod(ang, 2.0 * math.pi) if full else np.array(ang, np.float64)

    pos = th / dth
    i0 = np.floor(pos).astype(np.int64)
    fa = pos - i0

    idx_list, w_list = [], []
    c_s = (S - 1) / 2.0
    for ia, wa in [(i0, 1.0 - fa), (i0 + 1, fa)]:
        if mode == "parallel":
            wrapped = (ia >= n_ang) | (ia < 0)
            s_tap = np.where(wrapped, -s, s)
            ok_a = np.ones_like(ia, bool)
        else:
            s_tap = s
            ok_a = np.ones_like(ia, bool) if full else (ia >= 0) & (ia < n_ang)
        ia_m = np.mod(ia, n_ang)
        spos = s_tap / ds + c_s
        j0 = np.floor(spos).astype(np.int64)
        fs = spos - j0
        for jb, wb in [(j0, 1.0 - fs), (j0 + 1, fs)]:
            ok = ok_a & (jb >= 0) & (jb < S)
            if valid is not None:
                ok = ok & valid
            jb_c = np.clip(jb, 0, S - 1)
            idx_list.append(ia_m * S + jb_c)
            w_list.append(np.where(ok, wa * wb, 0.0))
    idx = np.stack(idx_list, axis=-1).astype(np.int32)
    w = np.stack(w_list, axis=-1).astype(np.float32)
    return idx, w


def build_fan_plan(geom: FanGeometry, dtype=jnp.float32) -> FanPlan:
    R = geom.source_distance
    Dd = geom.det_distance
    n_beta = geom.n_angles
    n_u = geom.det_count
    du = geom.det_spacing
    dp = geom.pixel_spacing
    betas = np.asarray(geom.angles, np.float64)
    # β grid spacing/coverage for inverse-rebinning interpolation. Uniform
    # grids only (the FanGeometry constructor builds uniform grids).
    beta_range = betas[-1] - betas[0] + (betas[1] - betas[0]) if n_beta > 1 else 2 * math.pi

    u = (np.arange(n_u) - (n_u - 1) / 2.0) * du
    gamma = np.arctan2(u, R + Dd)
    gamma_max = float(np.abs(gamma).max())

    # Backing parallel geometry: same angular density as the fan scan,
    # detector grid covering the fan FOV radius R·sin(γ_max).
    n_th = max(int(round(n_beta * math.pi / beta_range)), 16)
    ds = dp
    fov = R * math.sin(gamma_max)
    S_par = 2 * int(math.ceil(fov / ds)) + 1
    par_geom = ParallelGeometry(
        image_size=geom.image_size,
        n_angles=n_th,
        det_count=S_par,
        det_spacing=ds,
        pixel_spacing=dp,
    )
    par_angles = np.asarray(par_geom.angles)

    # fan ← parallel: request (θ = β + γ(u), s = R sinγ(u)) for every (β, u)
    TH = betas[:, None] + gamma[None, :]
    SS = np.broadcast_to(R * np.sin(gamma)[None, :], TH.shape)
    idx_f, w_f = _bilinear_taps(
        TH.ravel(), SS.ravel(), n_th, S_par, ds, mode="parallel"
    )
    fan_from_par = _RebinMap(
        jnp.asarray(idx_f), jnp.asarray(w_f), (n_beta, n_u), (n_th, S_par)
    )

    # parallel ← fan (for rebinning FBP): request (β = θ − γ(s), u(s)) for
    # every parallel (θ, s); rays with |s| ≥ fan FOV are unmeasured.
    s_par = (np.arange(S_par) - (S_par - 1) / 2.0) * ds
    sin_g = np.clip(s_par / R, -1.0, 1.0)
    g_of_s = np.arcsin(sin_g)
    u_of_s = (R + Dd) * np.tan(g_of_s)
    B = par_angles[:, None] - g_of_s[None, :]
    U = np.broadcast_to(u_of_s[None, :], B.shape)
    valid = np.broadcast_to((np.abs(s_par) < fov)[None, :], B.shape)
    idx_i, w_i = _bilinear_taps(
        (B - betas[0]).ravel(),
        U.ravel(),
        n_beta,
        n_u,
        du,
        mode="beta",
        ang_range=beta_range,
        valid=valid.ravel(),
    )
    par_from_fan = _RebinMap(
        jnp.asarray(idx_i), jnp.asarray(w_i), (n_th, S_par), (n_beta, n_u)
    )

    return FanPlan(geom, build_parallel_plan(par_geom, dtype), fan_from_par, par_from_fan)


def _rebin_apply(m: _RebinMap, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, *src_shape) → (B, *out_shape) via the static 4-tap gather."""
    B = x.shape[0]
    flat = x.reshape(B, -1)
    vals = jnp.take(flat, m.idx.ravel(), axis=1).reshape(B, -1, 4)
    out = jnp.sum(vals * m.w, axis=-1)
    return out.reshape((B,) + m.out_shape)


def _rebin_transpose(m: _RebinMap, y: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of :func:`_rebin_apply` (scatter-add, static indices)."""
    B = y.shape[0]
    flat = y.reshape(B, -1)
    contrib = flat[:, :, None] * m.w  # (B, n_out, 4)
    src = jnp.zeros((B, int(np.prod(m.src_shape))), y.dtype)
    src = src.at[:, m.idx.ravel()].add(contrib.reshape(B, -1))
    return src.reshape((B,) + m.src_shape)


def fan_project(plan: FanPlan, image: jnp.ndarray) -> jnp.ndarray:
    f, restore = _collapse_batch(image, 2)
    p_par = parallel_project(plan.par_plan, f)
    return restore(_rebin_apply(plan.fan_from_par, p_par))


def fan_backproject(plan: FanPlan, sino: jnp.ndarray) -> jnp.ndarray:
    p, restore = _collapse_batch(sino, 2)
    p_par = _rebin_transpose(plan.fan_from_par, p)
    return restore(parallel_backproject(plan.par_plan, p_par))


def make_fan_ops(geom: FanGeometry, dtype=jnp.float32) -> RadonOps:
    """Differentiable fan-beam operator bundle (same interface as parallel)."""
    from pdunet_tpu.ops.radon.filtering import filter_sinogram

    plan = build_fan_plan(geom, dtype)
    par_geom = plan.par_plan.geom

    @jax.custom_vjp
    def A(f):
        return fan_project(plan, f)

    def A_fwd(f):
        return A(f), None

    def A_bwd(_, g):
        return (fan_backproject(plan, g),)

    A.defvjp(A_fwd, A_bwd)

    @jax.custom_vjp
    def At(p):
        return fan_backproject(plan, p)

    def At_fwd(p):
        return At(p), None

    def At_bwd(_, g):
        return (fan_project(plan, g),)

    At.defvjp(At_fwd, At_bwd)

    bp_scale = (
        math.pi / par_geom.n_angles * par_geom.det_spacing / (par_geom.pixel_spacing ** 2)
    )

    def fbp(p, filter_name: str = "ramp"):
        pf, restore = _collapse_batch(p, 2)
        p_par = _rebin_apply(plan.par_from_fan, pf)
        filtered = filter_sinogram(p_par, par_geom.det_spacing, filter_name)
        return restore(bp_scale * parallel_backproject(plan.par_plan, filtered))

    return RadonOps(
        A=A,
        At=At,
        fbp=fbp,
        geom=geom,
        image_shape=(geom.image_size, geom.image_size),
        sino_shape=(geom.n_angles, geom.det_count),
    )
