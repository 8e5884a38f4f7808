"""Kaiser-Bessel gridding NUFFT, type-2 (forward) and type-1 (adjoint).

Design (SURVEY.md §2c "torchkbnufft → ops/nufft"): the golden-angle radial
trajectory is static per geometry, so everything data-independent happens at
plan-build time in NumPy:

  * k-space sample coordinates of every (spoke, readout) point,
  * the J×J Kaiser-Bessel interpolation taps of every sample, flattened to
    static (n_samples·J², ) index / weight arrays,
  * the image-domain apodization correction (numerical quadrature of the
    kernel's continuous Fourier transform — no closed-form-formula bugs),
  * the radial density-compensation function (area-element weights).

On device the forward is: deapodize → zero-pad to the σ-oversampled grid →
FFT2 (XLA) → static gather. The adjoint is the exact elementwise transpose:
static scatter-add → IFFT2·(σN)² → crop → deapodize. ⟨Ax, y⟩ = ⟨x, A†y⟩ to
machine precision, giving correct custom_vjp gradients through the unroll.

Conventions: images are (..., N, N) complex64, k-space data (..., n_spokes,
n_samples) complex64; k in radians/pixel with |k| ≤ π (image-grid Nyquist);
A(f)[m] ≈ Σ_x f[x]·exp(−i k_m·(x−c)) (type-2 DFT with centered image).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pdunet_tpu.geometry import RadialGeometry

__all__ = [
    "NufftPlan",
    "build_nufft_plan",
    "nufft_forward",
    "nufft_adjoint",
    "radial_dcf",
    "radial_dcf_pipe_menon",
    "make_radial_ops",
]


def _kb_kernel(t: np.ndarray, J: int, beta: float) -> np.ndarray:
    """Kaiser-Bessel kernel on offsets t (grid units), support |t| ≤ J/2."""
    mask = np.abs(t) <= J / 2.0
    arg = np.sqrt(np.maximum(1.0 - (2.0 * t / J) ** 2, 0.0))
    return np.where(mask, np.i0(beta * arg), 0.0)


def _kb_apodization(N: int, G: int, J: int, beta: float) -> np.ndarray:
    """Image-domain correction: continuous FT of the KB kernel, sampled at
    the N image positions (numerical quadrature, exact to ~1e-10)."""
    t = np.linspace(-J / 2.0, J / 2.0, 4096)
    c = _kb_kernel(t, J, beta)
    x = np.arange(N) - N // 2  # image pixel offsets from center
    # C(x) = ∫ c(t)·exp(i·2π·t·x/G) dt
    phase = np.exp(2j * math.pi * np.outer(x, t) / G)
    C = (phase @ c).real * (t[1] - t[0])
    return C


class NufftPlan:
    """Static NUFFT plan. Registered as a pytree (arrays = leaves)."""

    def __init__(self, geom, meta, idx, w, apod2d, dcf, phase=None):
        self.geom = geom
        self.meta = meta
        self.idx = idx        # (n_pts·J²,) int32 into flattened (G, G) grid
        self.w = w            # (n_pts, J²) float32
        self.apod2d = apod2d  # (N, N) float32
        self.dcf = dcf        # (n_spokes, n_samples) float32
        self.phase = phase

    def tree_flatten(self):
        return (self.idx, self.w, self.apod2d, self.dcf, self.phase), (
            self.geom, tuple(sorted(self.meta.items())),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        geom, meta_items = aux
        idx, w, apod2d, dcf, phase = children
        return cls(geom, dict(meta_items), idx, w, apod2d, dcf, phase)


jax.tree_util.register_pytree_node_class(NufftPlan)


def spoke_voronoi_dphi(spoke_angles) -> np.ndarray:
    """Per-spoke Voronoi cell width in orientation space [0, π).

    Golden-angle spokes are low-discrepancy but NOT uniform: at 512 spokes
    the angular gaps span a 2× range (0.0049–0.0098 rad). Each diameter
    spoke's cell is half the gap to its angular neighbor on either side
    (orientations folded mod π; the fold is exact because a diameter spoke
    at φ+π samples the same k-space line as φ, readout-reversed). Gaps sum
    to π by construction.
    """
    phis = np.asarray(spoke_angles, dtype=np.float64) % math.pi
    order = np.argsort(phis)
    s = phis[order]
    ext = np.concatenate([[s[-1] - math.pi], s, [s[0] + math.pi]])
    dphi_sorted = (ext[2:] - ext[:-2]) / 2.0
    dphi = np.empty_like(dphi_sorted)
    dphi[order] = dphi_sorted
    return dphi


def radial_dcf(geom: RadialGeometry) -> np.ndarray:
    """Radial area-element density compensation (ramp |k| with center fix).

    Cell area of sample at radius |r|: Δr·Δφ_k·|r| with Δφ_k the spoke's
    Voronoi width in orientation space (NOT the uniform π/n_spokes — for
    golden-angle trajectories the uniform approximation mis-weights spokes
    by up to 2×, costing 2.7 dB / 0.08 SSIM on dense-data DCF-adjoint recon:
    measured 43.43 dB/0.824 uniform → 46.13 dB/0.904 Voronoi at the shipped
    512-spoke 256² geometry, f32). The r≈0 cell gets the disk area
    π(Δr/2)²·(Δφ_k/π) shared across spokes.
    """
    n_sp, n_ro = geom.n_spokes, geom.samples_per_spoke
    k_max = math.pi / geom.pixel_spacing
    r = (np.arange(n_ro) - n_ro / 2.0) * (2.0 * k_max / n_ro)
    dr = 2.0 * k_max / n_ro
    dphi = spoke_voronoi_dphi(geom.spoke_angles)  # (n_sp,)
    w = np.abs(r)[None, :] * dr * dphi[:, None]
    w = np.maximum(w, math.pi * (dr / 2.0) ** 2 * (dphi[:, None] / math.pi))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _plan_tables(geom: RadialGeometry, oversamp: float = 2.0, J: int = 4) -> dict:
    """Host-side (NumPy, f64) gridding tables shared by the device plan and
    the Pipe-Menon DCF solver: tap indices/weights + deapodization.

    Memoized per (geom, oversamp, J) — geometry configs are frozen hashable
    dataclasses — because every ``build_nufft_plan(dcf='pipe_menon')``
    otherwise builds the identical tables twice (once directly, once inside
    the DCF solver). Callers treat the returned dict as read-only."""
    N = geom.image_size
    G = int(round(oversamp * N))
    beta = math.pi * math.sqrt((J / oversamp) ** 2 * (oversamp - 0.5) ** 2 - 0.8)

    # trajectory: k_m = r_i · (cos φ_k, sin φ_k), r uniform over [-k_max, k_max)
    n_sp, n_ro = geom.n_spokes, geom.samples_per_spoke
    k_max = math.pi / geom.pixel_spacing
    r = (np.arange(n_ro) - n_ro / 2.0) * (2.0 * k_max / n_ro)
    phis = np.asarray(geom.spoke_angles)
    kx = r[None, :] * np.cos(phis)[:, None]   # (n_sp, n_ro)
    ky = r[None, :] * np.sin(phis)[:, None]

    # grid coordinates: frequency spacing 2π/G (pixel_spacing folded into k)
    gx = (kx.ravel() * geom.pixel_spacing) * G / (2.0 * math.pi) + G / 2.0
    gy = (ky.ravel() * geom.pixel_spacing) * G / (2.0 * math.pi) + G / 2.0
    n_pts = gx.size

    offs = np.arange(J) - (J / 2.0 - 1.0)      # J taps: floor-based window
    ix0 = np.floor(gx).astype(np.int64)
    iy0 = np.floor(gy).astype(np.int64)
    taps_x = ix0[:, None] + offs[None, :]      # (n_pts, J)
    taps_y = iy0[:, None] + offs[None, :]
    wx = _kb_kernel(gx[:, None] - taps_x, J, beta)
    wy = _kb_kernel(gy[:, None] - taps_y, J, beta)
    # periodic wrap (FFT grid is periodic; |k| ≤ π keeps wraps at the edge only)
    taps_x = np.mod(taps_x, G)
    taps_y = np.mod(taps_y, G)
    # outer product over the 2D neighborhood → (n_pts, J, J)
    w2 = wy[:, :, None] * wx[:, None, :]
    idx2 = taps_y[:, :, None] * G + taps_x[:, None, :]
    idx = idx2.reshape(n_pts, J * J).astype(np.int64)
    w = w2.reshape(n_pts, J * J)

    # Image-domain deapodization: dividing by the kernel's continuous FT
    # makes gather-after-FFT match the direct type-2 DFT (no extra FFT
    # normalization: fft2 is the plain unnormalized sum, which is exactly
    # the type-2 definition).
    apod_x = _kb_apodization(N, G, J, beta)
    apod2d = np.outer(apod_x, apod_x)
    return dict(N=N, G=G, J=J, n_sp=n_sp, n_ro=n_ro,
                idx=idx, w=w, apod2d=apod2d)


def _np_nufft_forward(T: dict, f: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`nufft_forward` (single image, f64) for host-side
    DCF computation — asserted against the jax path in tests/test_nufft.py."""
    N, G = T["N"], T["G"]
    lo = G // 2 - N // 2
    fp = np.zeros((G, G), complex)
    fp[lo:lo + N, lo:lo + N] = f / T["apod2d"]
    Fk = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(fp)))
    vals = Fk.ravel()[T["idx"]]
    return (vals * T["w"]).sum(-1).reshape(T["n_sp"], T["n_ro"])


def _np_nufft_adjoint(T: dict, k: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`nufft_adjoint` (single k-space set, f64)."""
    N, G = T["N"], T["G"]
    contrib = (k.reshape(-1, 1) * T["w"]).ravel()
    ii = T["idx"].ravel()
    grid = (np.bincount(ii, weights=contrib.real, minlength=G * G)
            + 1j * np.bincount(ii, weights=contrib.imag, minlength=G * G))
    f = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(grid.reshape(G, G)))) * (G * G)
    lo = G // 2 - N // 2
    return f[lo:lo + N, lo:lo + N] / T["apod2d"]


@functools.lru_cache(maxsize=None)
def radial_dcf_pipe_menon(
    geom: RadialGeometry, n_iters: int = 2,
    oversamp: float = 2.0, J: int = 4,
) -> np.ndarray:
    """Pipe-Menon iterative density compensation (Pipe & Menon, MRM 1999),
    seeded from the Voronoi-ramp analytic weights.

    Fixed point of w ← w / |A(A†(w))|: the compensated point-spread function
    becomes flat across the sampled region, correcting what the area-element
    model misses (KB-kernel sidelobes, finite-J gridding error, inter-spoke
    interference near DC). Measured on the shipped 512-spoke 256² geometry
    (f32, fixed scale): 46.13 dB/0.904 Voronoi → 49.33 dB/0.984 at 2
    iterations. MORE iterations diverge (8 → 48.3, 12 → 41.7: the unregular-
    ized fixed point amplifies kernel-null noise), so n_iters=2 is the
    shipped default. Runs host-side in NumPy at plan build (~6 s at 512
    spokes, cached per geometry); the absolute scale is pinned by a unit-gain
    calibration on a smooth Gaussian so ``At(k·dcf)/(2π)²`` reconstructs in
    image units without per-image refitting.
    """
    T = _plan_tables(geom, oversamp, J)
    w = radial_dcf(geom).astype(np.float64)
    for _ in range(n_iters):
        denom = np.abs(_np_nufft_forward(T, _np_nufft_adjoint(T, w)))
        w = w / np.maximum(denom, 1e-12)
    N = geom.image_size
    x = (np.arange(N) - N // 2) / N
    cal = np.exp(-(x[None, :] ** 2 + x[:, None] ** 2) / (2.0 * 0.15 ** 2))
    recon = _np_nufft_adjoint(T, w * _np_nufft_forward(T, cal)).real
    s = float((recon * cal).sum() / (cal * cal).sum())
    return (w * (2.0 * math.pi) ** 2 / s).astype(np.float32)


def _resolve_dcf(geom: RadialGeometry, dcf: str,
                 oversamp: float = 2.0, J: int = 4) -> np.ndarray:
    if dcf == "pipe_menon":
        return radial_dcf_pipe_menon(geom, oversamp=oversamp, J=J)
    if dcf == "voronoi_ramp":
        return radial_dcf(geom)
    raise ValueError(
        f"unknown dcf {dcf!r}: expected 'pipe_menon' or 'voronoi_ramp'")


def build_nufft_plan(
    geom: RadialGeometry, oversamp: float = 2.0, J: int = 4,
    dcf: str = "pipe_menon",
) -> NufftPlan:
    T = _plan_tables(geom, oversamp, J)
    idx = T["idx"].astype(np.int32)
    w = T["w"].astype(np.float32)
    apod2d = T["apod2d"].astype(np.float32)
    n_sp, n_ro = T["n_sp"], T["n_ro"]

    from pdunet_tpu.utils.device import materialize

    meta = dict(N=T["N"], G=T["G"], J=J, n_spokes=n_sp, n_samples=n_ro)
    return materialize(NufftPlan(
        geom,
        meta,
        jnp.asarray(idx.ravel()),
        jnp.asarray(w),
        jnp.asarray(apod2d),
        jnp.asarray(_resolve_dcf(geom, dcf, oversamp, J)),
    ))


def _pad_center(f: jnp.ndarray, N: int, G: int) -> jnp.ndarray:
    lo = G // 2 - N // 2
    return jnp.zeros(f.shape[:-2] + (G, G), f.dtype).at[
        ..., lo : lo + N, lo : lo + N
    ].set(f)


def _crop_center(F: jnp.ndarray, N: int, G: int) -> jnp.ndarray:
    lo = G // 2 - N // 2
    return F[..., lo : lo + N, lo : lo + N]


def nufft_forward(plan: NufftPlan, image: jnp.ndarray) -> jnp.ndarray:
    """Type-2 NUFFT: (..., N, N) complex → (..., n_spokes, n_samples) complex."""
    meta = plan.meta
    N, G = meta["N"], meta["G"]
    n_sp, n_ro = meta["n_spokes"], meta["n_samples"]
    batch = image.shape[:-2]
    f = image.reshape((-1, N, N)).astype(jnp.complex64)
    f = f / plan.apod2d
    Fk = jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.ifftshift(_pad_center(f, N, G), axes=(-2, -1))),
        axes=(-2, -1),
    )
    flat = Fk.reshape(f.shape[0], G * G)
    vals = jnp.take(flat, plan.idx, axis=1).reshape(f.shape[0], -1, meta["J"] ** 2)
    out = jnp.sum(vals * plan.w, axis=-1)
    return out.reshape(batch + (n_sp, n_ro))


def nufft_adjoint(plan: NufftPlan, kdata: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of :func:`nufft_forward` (type-1 gridding)."""
    meta = plan.meta
    N, G = meta["N"], meta["G"]
    batch = kdata.shape[:-2]
    g = kdata.reshape((-1, meta["n_spokes"] * meta["n_samples"])).astype(jnp.complex64)
    contrib = g[:, :, None] * plan.w
    grid = jnp.zeros((g.shape[0], G * G), jnp.complex64)
    grid = grid.at[:, plan.idx].add(contrib.reshape(g.shape[0], -1))
    Fk = grid.reshape(g.shape[0], G, G)
    f = jnp.fft.fftshift(
        jnp.fft.ifft2(jnp.fft.ifftshift(Fk, axes=(-2, -1))), axes=(-2, -1)
    ) * (G * G)
    f = _crop_center(f, N, G) / plan.apod2d
    return f.reshape(batch + (N, N))


class NufftOps(NamedTuple):
    """Differentiable NUFFT operator bundle (mirrors RadonOps: ``fbp`` is the
    density-compensated adjoint — the direct-recon analogue)."""

    A: Callable
    At: Callable
    fbp: Callable
    geom: RadialGeometry
    image_shape: tuple
    sino_shape: tuple
    dcf: jnp.ndarray


def make_radial_ops(
    geom: RadialGeometry,
    oversamp: float = 2.0,
    J: int = 4,
    impl: str = "fourier_slice",
    dtype=None,
    mesh=None,
    angle_axis: str = "angle",
    batch_axis: str = None,
    dcf: str = "pipe_menon",
) -> NufftOps:
    """Differentiable radial NUFFT bundle.

    impl="fourier_slice" (default): projection-slice matmul pipeline — the
    TPU production path (see ops/nufft/fourier_slice.py).
    impl="gridding": Kaiser-Bessel gather/scatter — the numerical oracle
    (and the general-trajectory fallback).
    ``mesh``: spoke-shard the fast path's underlying parallel projection
    over ``angle_axis`` (SURVEY.md §5.7; fourier_slice only — gridding is
    the oracle and stays single-device).
    ``dcf``: density compensation for ``fbp`` — "pipe_menon" (default;
    +3.2 dB/+0.08 SSIM dense-recon over the analytic weights) or
    "voronoi_ramp" (the analytic area-element seed).
    """
    if impl == "fourier_slice" and geom.samples_per_spoke % 2:
        # the spectral grid of the projection-slice path needs an even
        # readout length (build_fs_plan would raise); the KB-gridding
        # oracle handles odd grids, so degrade gracefully rather than
        # break callers that only chose the default impl
        import warnings

        warnings.warn(
            "fourier_slice needs an even samples_per_spoke (got "
            f"{geom.samples_per_spoke}); falling back to impl='gridding'",
            stacklevel=2,
        )
        impl = "gridding"
    if impl == "fourier_slice":
        from pdunet_tpu.ops.nufft.fourier_slice import (
            build_fs_plan,
            fs_nufft_adjoint,
            fs_nufft_forward,
        )

        import jax.numpy as _jnp

        fs_plan = build_fs_plan(geom, dtype=dtype or _jnp.float32)

        if mesh is not None:
            from pdunet_tpu.ops.radon.parallel import padded_batch_caller

            # pads the COMPLEX batch: the fs pipeline stacks (Re, Im)
            # along batch, so divisibility by the data axis is preserved
            _through = padded_batch_caller(mesh, batch_axis)

            _fwd = lambda f: _through(
                lambda x: fs_nufft_forward(fs_plan, x, mesh, angle_axis,
                                           batch_axis), f)
            _adj = lambda k: _through(
                lambda x: fs_nufft_adjoint(fs_plan, x, mesh, angle_axis,
                                           batch_axis), k)
        else:
            _fwd = lambda f: fs_nufft_forward(fs_plan, f)
            _adj = lambda k: fs_nufft_adjoint(fs_plan, k)

        @jax.custom_vjp
        def A(f):
            return _fwd(f)

        def A_fwd(f):
            return A(f), None

        def A_bwd(_, g):
            return (jnp.conj(_adj(jnp.conj(g))),)

        A.defvjp(A_fwd, A_bwd)

        @jax.custom_vjp
        def At(k):
            return _adj(k)

        def At_fwd(k):
            return At(k), None

        def At_bwd(_, g):
            return (jnp.conj(_fwd(jnp.conj(g))),)

        At.defvjp(At_fwd, At_bwd)

        dcf_arr = jnp.asarray(_resolve_dcf(geom, dcf))

        def fbp(kdata, filter_name=None):
            del filter_name
            return At(kdata * dcf_arr) / (2.0 * math.pi) ** 2

        return NufftOps(
            A=A,
            At=At,
            fbp=fbp,
            geom=geom,
            image_shape=(geom.image_size, geom.image_size),
            sino_shape=(geom.n_spokes, geom.samples_per_spoke),
            dcf=dcf_arr,
        )

    if impl != "gridding":
        raise ValueError(f"unknown NUFFT impl {impl!r}")
    if mesh is not None:
        raise NotImplementedError(
            "mesh sharding applies to the fourier_slice fast path only; the "
            "gridding oracle is single-device by design"
        )
    plan = build_nufft_plan(geom, oversamp, J, dcf=dcf)

    # Complex custom_vjp: JAX's cotangent convention for C-linear maps is
    # x̄ = conj(A†(conj(ḡ))) — verified against plain autodiff and finite
    # differences (tests/test_nufft.py::test_complex_custom_vjp). For real
    # operators the conjugations are no-ops, matching the Radon pairing.
    @jax.custom_vjp
    def A(f):
        return nufft_forward(plan, f)

    def A_fwd(f):
        return A(f), None

    def A_bwd(_, g):
        return (jnp.conj(nufft_adjoint(plan, jnp.conj(g))),)

    A.defvjp(A_fwd, A_bwd)

    @jax.custom_vjp
    def At(k):
        return nufft_adjoint(plan, k)

    def At_fwd(k):
        return At(k), None

    def At_bwd(_, g):
        return (jnp.conj(nufft_forward(plan, jnp.conj(g))),)

    At.defvjp(At_fwd, At_bwd)

    def fbp(kdata, filter_name=None):
        """MRI analogue of FBP: density-compensated gridded adjoint.

        f(x) ≈ (2π)⁻² Σ_m F(k_m)·dcf_m·e^{ik_m·(x−c)} — the discretized
        inverse Fourier integral; At supplies the e^{ik·x} sum exactly.
        """
        del filter_name
        return nufft_adjoint(plan, kdata * plan.dcf) / (2.0 * math.pi) ** 2

    return NufftOps(
        A=A,
        At=At,
        fbp=fbp,
        geom=geom,
        image_shape=(geom.image_size, geom.image_size),
        sino_shape=(geom.n_spokes, geom.samples_per_spoke),
        dcf=plan.dcf,
    )
