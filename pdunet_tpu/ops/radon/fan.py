"""Fan-beam Radon forward / adjoint / FBP via exact rebinning composition.

Replaces torch-radon's ``RadonFanbeam`` CUDA kernels (SURVEY.md §2b C1, §2c
"fan_fwd / fan_adj"). TPU-native design: a fan ray and a parallel ray are the
*same line* under

    p_fan(β, γ) = p_par(θ = β + γ,  s = R·sinγ),      tanγ = u / (R + D),

so the fan operator factors into the MXU-friendly parallel projector
sandwiched between static rebinning maps. The maps are *axis-separable*,
and both separable stages run as matmuls (on TPU even minor-axis
take_along_axis runs at gather speed, ~1e8 elem/s — it dominated the fan
recon wall time until the 2-tap angle interp became a banded contraction):

  * The backing parallel sinogram is computed on an **extended angle grid**
    θ_i = β₀ + (i − margin)·Δβ covering [β₀ − γ_max, β_last + γ_max] with the
    *same spacing as the fan scan*, so the angle coordinate of (β_k, u) is
    exactly k + c(u): an integer row index plus a per-detector fractional
    shift. Angle interpolation is then a 2-banded per-detector matmul
    against weights generated on the fly (``_band_weights``); no mod-π
    flip logic is needed at apply time (the parallel projector accepts any
    angle, conjugate rows are simply computed directly).
  * The detector coordinate depends only on u (s = R·sinγ(u)), so detector
    resampling is a small dense matmul with a 2-banded matrix (MXU).

Forward = project_ext → (· @ Ms) → banded angle matmul;  adjoint is the
exact transpose of each factor (no gathers or scatters in either
direction). FBP rebins fan→parallel the same way, weights rows by the local
direction multiplicity (conjugate rays covered ~twice on a 2π scan), ramp
filters, and backprojects; limited-angle scans simply have zero-padded
(unmeasured) regions.
"""

from __future__ import annotations

import math

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


@jax.tree_util.register_pytree_node_class
class FanPlan:
    ARRAYS = ("Ms", "Mu", "c0", "cf", "d0", "df", "wrow")

    def __init__(self, geom, meta, par_plan, Ms, Mu, c0, cf, d0, df, wrow):
        self.geom = geom
        self.meta = meta
        self.par_plan = par_plan
        self.Ms, self.Mu = Ms, Mu
        self.c0, self.cf = c0, cf
        self.d0, self.df = d0, df
        self.wrow = wrow

    def tree_flatten(self):
        children = (self.par_plan, self.Ms, self.Mu, self.c0, self.cf,
                    self.d0, self.df, self.wrow)
        return children, (self.geom, tuple(sorted(self.meta.items())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        geom, meta_items = aux
        return cls(geom, dict(meta_items), *children)


def _hat_matrix(positions: np.ndarray, size: int, spacing: float,
                valid: np.ndarray | None = None) -> np.ndarray:
    """(size, len(positions)) 2-banded linear-interp matrix: column p has hat
    taps at grid index positions[p]/spacing + center."""
    n = positions.size
    c = (size - 1) / 2.0
    pos = positions / spacing + c
    j0 = np.floor(pos).astype(np.int64)
    frac = pos - j0
    M = np.zeros((size, n))
    ok = (j0 >= 0) & (j0 < size)
    if valid is not None:
        ok &= valid
    cols = np.arange(n)
    M[np.clip(j0, 0, size - 1), cols] += np.where(ok, 1.0 - frac, 0.0)
    ok1 = (j0 + 1 >= 0) & (j0 + 1 < size)
    if valid is not None:
        ok1 &= valid
    M[np.clip(j0 + 1, 0, size - 1), cols] += np.where(ok1, frac, 0.0)
    return M


def build_fan_plan(geom: FanGeometry, dtype=jnp.float32) -> FanPlan:
    R, Dd = geom.source_distance, geom.det_distance
    n_beta, n_u = geom.n_angles, geom.det_count
    du, dp = geom.det_spacing, geom.pixel_spacing
    betas = np.asarray(geom.angles, np.float64)
    dbeta = betas[1] - betas[0] if n_beta > 1 else 2 * math.pi
    beta_span = betas[-1] - betas[0] + dbeta
    full_circle = abs(beta_span - 2 * math.pi) < 1e-6

    u = (np.arange(n_u) - (n_u - 1) / 2.0) * du
    gamma = np.arctan2(u, R + Dd)
    gamma_max = float(np.abs(gamma).max())
    fov = R * math.sin(gamma_max)

    ds = dp
    S_par = 2 * int(math.ceil(fov / ds)) + 3

    # extended parallel angle grid, same spacing as the fan scan
    margin = int(math.ceil(gamma_max / dbeta)) + 2
    n_ext = n_beta + 2 * margin
    thetas = betas[0] + (np.arange(n_ext) - margin) * dbeta
    par_geom = ParallelGeometry(
        image_size=geom.image_size,
        det_count=S_par,
        det_spacing=ds,
        pixel_spacing=dp,
        angles=tuple(float(t) for t in thetas),
    )

    # forward rebin pieces: angle index of (β_k, u) is k + margin + γ(u)/Δβ
    c = margin + gamma / dbeta
    c0 = np.floor(c).astype(np.int32)
    cf = (c - c0).astype(np.float32)
    # detector resample matrix: p_par sampled at s(u) = R sinγ(u)
    Ms = _hat_matrix(R * np.sin(gamma), S_par, ds)

    # inverse rebin pieces (FBP): β index of (θ_i, s) is i − margin − γ(s)/Δβ
    s_par = (np.arange(S_par) - (S_par - 1) / 2.0) * ds
    sin_g = np.clip(s_par / R, -1.0, 1.0)
    g_of_s = np.arcsin(sin_g)
    valid_s = np.abs(s_par) < fov
    d = -margin - g_of_s / dbeta
    d0 = np.floor(d).astype(np.int32)
    df = (d - d0).astype(np.float32)
    Mu = _hat_matrix((R + Dd) * np.tan(g_of_s), n_u, du, valid=valid_s)

    # FBP row weights: Δβ per covered direction, shared across the conjugate
    # rows that measure the same θ mod π (triangular-window multiplicity so
    # odd spoke counts / interleaved conjugates are handled smoothly).
    th_mod = np.mod(thetas, math.pi)
    diff = np.abs(th_mod[:, None] - th_mod[None, :])
    diff = np.minimum(diff, math.pi - diff)
    mult = np.maximum(np.sum(np.maximum(1.0 - diff / dbeta, 0.0), axis=1), 1.0)
    wrow = (dbeta / mult * ds / (dp * dp)).astype(np.float32)

    meta = dict(
        n_beta=n_beta, n_u=n_u, n_ext=n_ext, S_par=S_par, margin=margin,
        full_circle=bool(full_circle),
        # must cover max |c0|+1 in both gather directions: c0 ≤ margin + γ_max/Δβ < 2·margin
        pad_beta=int(2 * margin + 2),
        pad_ext=int(2 * margin + int(math.ceil(gamma_max / dbeta)) + 2),
    )
    if full_circle and meta["pad_ext"] > n_beta:
        # the periodic-wrap rebin concatenates p[:, -pad:] / p[:, :pad]; with
        # fewer than pad rows the slices silently shrink and misalign base
        raise ValueError(
            f"full-circle fan scan too sparse to rebin: need pad_ext="
            f"{meta['pad_ext']} wrap rows but only n_beta={n_beta} views; "
            "increase n_angles or reduce the fan angle"
        )
    def dev(a, dt=dtype):
        # host-side dtype conversion (see geometry.build_parallel_plan)
        return jnp.asarray(np.asarray(a, np.dtype(dt)))

    from pdunet_tpu.utils.device import materialize

    return materialize(FanPlan(
        geom,
        meta,
        build_parallel_plan(par_geom, dtype),
        dev(Ms),
        dev(Mu),
        jnp.asarray(c0),
        dev(cf),
        jnp.asarray(d0),
        dev(df),
        dev(wrow),
    ))


def _band_weights(base: jnp.ndarray, frac: jnp.ndarray, n_out: int,
                  n_in: int, pad: int, dtype) -> jnp.ndarray:
    """(U, n_out, n_in + 2·pad) two-banded interpolation weights, generated
    on the fly from the compact per-column (base, frac) arrays: row o of
    column u reads padded input rows o+base_u (weight 1−frac_u) and
    o+base_u+1 (weight frac_u). VPU iota/compares — a few MB, regenerated
    per call so the plan stays compact (geometry.py rationale)."""
    i = jnp.arange(n_in + 2 * pad)[None, None, :]
    o = jnp.arange(n_out)[None, :, None]
    b = base[:, None, None] + pad
    f = frac[:, None, None].astype(dtype)
    one = jnp.ones((), dtype)
    return ((i == o + b).astype(dtype) * (one - f)
            + (i == o + b + 1).astype(dtype) * f)


def _gather_rows(x: jnp.ndarray, base: jnp.ndarray, frac: jnp.ndarray,
                 n_out: int, pad: int) -> jnp.ndarray:
    """Separable 2-tap angle interp: x (B, n_in, U) → (B, n_out, U) with
    out[b, k, u] = (1−frac_u)·x[b, k + base_u, u] + frac_u·x[b, k + base_u + 1, u].

    ``base`` may be negative; ``pad`` zero-rows are added on both sides so
    every index lands in range. Implemented as a u-batched MXU contraction
    against on-the-fly banded weights: even minor-axis take_along_axis runs
    at gather speed (~1e8 elem/s) and dominated the fan recon wall time
    (measured 86.8 slices/s with gathers; the two taps as a matmul put the
    rebin back on the MXU).
    """
    B, n_in, U = x.shape
    W = _band_weights(base, frac, n_out, n_in, pad, x.dtype)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    out = jnp.einsum("uoi,biu->bou", W, xp,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _scatter_rows_T(y: jnp.ndarray, base: jnp.ndarray, frac: jnp.ndarray,
                    n_in: int, pad: int) -> jnp.ndarray:
    """Exact transpose of :func:`_gather_rows`: the same banded weights
    contracted over the output axis, then the zero-pad rows sliced off."""
    B, n_out, U = y.shape
    W = _band_weights(base, frac, n_out, n_in, pad, y.dtype)
    out = jnp.einsum("uoi,bou->biu", W, y,
                     preferred_element_type=jnp.float32)
    return out[:, pad:pad + n_in].astype(y.dtype)


def fan_project(plan: FanPlan, image: jnp.ndarray, mesh=None,
                angle_axis: str = "angle",
                batch_axis: str = None) -> jnp.ndarray:
    """``mesh``: angle-shard the extended-grid parallel projection (the
    FLOPs- and memory-dominant stage; SURVEY.md §5.7) — the rebin gathers
    and the 2-banded detector matmul stay global (cheap bandwidth ops)."""
    meta = plan.meta
    f, restore = _collapse_batch(image, 2)
    p_par = parallel_project(plan.par_plan, f, mesh=mesh,
                             angle_axis=angle_axis,
                             batch_axis=batch_axis)          # (B, n_ext, S_par)
    q = jnp.einsum("bis,su->biu", p_par, plan.Ms)            # detector resample
    p_fan = _gather_rows(q, plan.c0, plan.cf, meta["n_beta"], meta["pad_beta"])
    return restore(p_fan)


def fan_backproject(plan: FanPlan, sino: jnp.ndarray, mesh=None,
                    angle_axis: str = "angle",
                    batch_axis: str = None) -> jnp.ndarray:
    meta = plan.meta
    p, restore = _collapse_batch(sino, 2)
    q_t = _scatter_rows_T(p, plan.c0, plan.cf, meta["n_ext"], meta["pad_beta"])
    p_par = jnp.einsum("biu,su->bis", q_t, plan.Ms)
    return restore(parallel_backproject(plan.par_plan, p_par, mesh=mesh,
                                        angle_axis=angle_axis,
                                        batch_axis=batch_axis))


def fan_rebin_to_parallel(plan: FanPlan, sino: jnp.ndarray) -> jnp.ndarray:
    """Estimate the extended parallel sinogram from fan data (FBP path)."""
    meta = plan.meta
    p, restore = _collapse_batch(sino, 2)
    if meta["full_circle"]:
        # periodic β: wrap rows instead of zero-padding
        pad = meta["pad_ext"]
        p = jnp.concatenate([p[:, -pad:], p, p[:, :pad]], axis=1)
        base = plan.d0 + pad
        p_ext = _gather_rows(
            jnp.einsum("bku,us->bks", p, plan.Mu),
            base, plan.df, meta["n_ext"], 2,
        )
    else:
        p_ext = _gather_rows(
            jnp.einsum("bku,us->bks", p, plan.Mu),
            plan.d0, plan.df, meta["n_ext"], meta["pad_ext"],
        )
    return restore(p_ext)


def make_fan_ops(geom: FanGeometry, dtype=jnp.float32, mesh=None,
                 angle_axis: str = "angle",
                 batch_axis: str = None) -> RadonOps:
    """Differentiable fan-beam operator bundle (same interface as parallel).

    ``mesh``: angle-shard the underlying extended-grid parallel projector
    over ``angle_axis`` (the beyond-HBM path, SURVEY.md §5.7); the batch is
    zero-padded up to the ``batch_axis`` size so traced batch-1 inits and
    ragged eval batches work."""
    from pdunet_tpu.ops.radon.filtering import filter_sinogram
    from pdunet_tpu.ops.radon.parallel import padded_batch_caller

    plan = build_fan_plan(geom, dtype)
    ds = plan.par_plan.geom.det_spacing
    through = padded_batch_caller(mesh, batch_axis)
    if mesh is not None:
        _proj = lambda f: through(
            lambda x: fan_project(plan, x, mesh, angle_axis, batch_axis), f)
        _bproj = lambda p: through(
            lambda x: fan_backproject(plan, x, mesh, angle_axis, batch_axis), p)
    else:
        _proj = lambda f: fan_project(plan, f)
        _bproj = lambda p: fan_backproject(plan, p)

    @jax.custom_vjp
    def A(f):
        return _proj(f)

    def A_fwd(f):
        return A(f), None

    def A_bwd(_, g):
        return (_bproj(g),)

    A.defvjp(A_fwd, A_bwd)

    @jax.custom_vjp
    def At(p):
        return _bproj(p)

    def At_fwd(p):
        return At(p), None

    def At_bwd(_, g):
        return (_proj(g),)

    At.defvjp(At_fwd, At_bwd)

    def fbp(p, filter_name: str = "ramp"):
        def body(pf):
            p_ext = fan_rebin_to_parallel(plan, pf)
            filt = (filter_sinogram(p_ext, ds, filter_name)
                    * plan.wrow[None, :, None])
            return parallel_backproject(plan.par_plan, filt, mesh=mesh,
                                        angle_axis=angle_axis,
                                        batch_axis=batch_axis)

        return through(body, p)

    return RadonOps(
        A=A,
        At=At,
        fbp=fbp,
        geom=geom,
        image_shape=(geom.image_size, geom.image_size),
        sino_shape=(geom.n_angles, geom.det_count),
    )
