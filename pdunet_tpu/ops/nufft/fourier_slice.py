"""Radial NUFFT via the projection-slice theorem — the TPU fast path.

The gridding NUFFT (ops/nufft/nufft.py) is exact but gather/scatter-shaped;
TPU flat gathers move ~1e8 elem/s, so a 4M-tap gridding pass costs tens of
milliseconds. This module reformulates the *radial* NUFFT (the only
trajectory the reference needs — golden-angle spokes, SURVEY.md §2b C2/C3)
through the projection-slice theorem:

    F₂{f}(r·ω(θ)) = F₁{ Radon f (θ, ·) }(r)

so the radial type-2 NUFFT = the MXU-factored parallel-beam projector
(complex via an (Re, Im)-stacked batch) followed by a small NUDFT matmul
along the detector axis, with an exact analytic deapodization (the
projector's hat footprint divides out as 1/sinc²(r·δs/2)). Everything is a
matmul; the adjoint is the exact transpose of each factor.

Spokes with angle ≥ π reuse the mod-π parallel projection with the detector
axis flipped (sample at r·ω(φ) = (−r)·ω(φ−π)); the detector grid has odd
length so the flip is exact about s = 0.

The gridding implementation remains the numerical oracle (CPU twin); tests
pin both against the direct type-2 DFT.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pdunet_tpu.geometry import ParallelGeometry, RadialGeometry, build_parallel_plan
from pdunet_tpu.ops.radon.parallel import (
    _collapse_batch,
    parallel_backproject,
    parallel_project,
)

__all__ = ["FsPlan", "build_fs_plan", "fs_nufft_forward", "fs_nufft_adjoint"]


@jax.tree_util.register_pytree_node_class
class FsPlan:
    ARRAYS = ("Ec", "Es", "flip", "Cc", "Cs")

    def __init__(self, geom, meta, par_plan, Ec, Es, flip, Cc, Cs):
        self.geom = geom
        self.meta = meta
        self.par_plan = par_plan
        self.Ec, self.Es, self.flip = Ec, Es, flip
        self.Cc, self.Cs = Cc, Cs

    def tree_flatten(self):
        return (
            (self.par_plan, self.Ec, self.Es, self.flip, self.Cc, self.Cs),
            (self.geom, tuple(sorted(self.meta.items()))),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        geom, meta_items = aux
        return cls(geom, dict(meta_items), *children)


def build_fs_plan(geom: RadialGeometry, dtype=jnp.float32, oversamp: int = 2) -> FsPlan:
    N = geom.image_size
    dp = geom.pixel_spacing
    n_sp, n_ro = geom.n_spokes, geom.samples_per_spoke

    # Detector grid covering the full square image support (corners), odd
    # length so the flip s → −s is exact. The grid is ``oversamp``× finer
    # than the pixel pitch: with δs = δp the spoke band edge |r| = π/δp sits
    # exactly at the projection-sampling Nyquist, where the discretely
    # sampled linear splat's transfer vanishes (irrecoverable); at δs = δp/2
    # the band edge is half-Nyquist and the sinc² deapodization is exact to
    # the aliasing floor.
    ds = dp / oversamp
    S = int(math.ceil(N * math.sqrt(2.0) / ds * dp)) + 3
    S += (S + 1) % 2
    phis = np.asarray(geom.spoke_angles)
    theta = np.mod(phis, math.pi)
    flip = phis >= math.pi  # r·ω(φ) = (−r)·ω(φ−π)

    par_geom = ParallelGeometry(
        image_size=N,
        det_count=S,
        det_spacing=ds,
        pixel_spacing=dp,
        angles=tuple(float(t) for t in theta),
    )

    # NUDFT along the detector axis: F(r_m) = δs·Σ_s p[s]·e^{−i r_m s_pos},
    # divided by the projector's Kaiser-Bessel footprint spectrum (numerical
    # quadrature — exact to the gridding aliasing floor; a hat footprint's
    # sampled transfer ripples ±20% near the band edge, KB's does not).
    from pdunet_tpu.geometry import KB_BETA, KB_WIDTH, _kb

    k_max = math.pi / dp
    r = (np.arange(n_ro) - n_ro / 2.0) * (2.0 * k_max / n_ro)
    s_pos = (np.arange(S) - (S - 1) / 2.0) * ds
    t = np.linspace(-KB_WIDTH * ds / 2.0, KB_WIDTH * ds / 2.0, 4096)
    kb = _kb(t, KB_WIDTH * ds, KB_BETA)
    spec = (np.cos(np.outer(r, t)) @ kb) * (t[1] - t[0])  # ∫KB(t)cos(rt)dt
    # F = δs·Σ_s p·e^{−irs} / ((δp²/δs)·spec)  ⇒  per-sum factor δs²/(δp²·spec)
    deapod = ds * ds / (dp * dp * spec)
    ang = np.outer(s_pos, r)  # (S, n_ro)
    Ec = np.cos(ang) * deapod[None, :]
    Es = np.sin(ang) * deapod[None, :]

    # Center-convention correction: the projector centers pixels at
    # (N−1)/2, the NUFFT convention (matching the FFT-gridding impl and the
    # direct-DFT oracle) at N//2 — a half-pixel offset d for even N.
    # F_nufft(k) = F_proj(k)·e^{+i(k_x+k_y)d}, per (spoke, radius).
    d = (N // 2 - (N - 1) / 2.0) * dp
    kxy = r[None, :] * (np.cos(phis) + np.sin(phis))[:, None]  # (A, n_ro)
    Cc = np.cos(kxy * d)
    Cs = np.sin(kxy * d)

    from pdunet_tpu.utils.device import materialize

    meta = dict(N=N, S=S, n_spokes=n_sp, n_samples=n_ro)
    return materialize(FsPlan(
        geom,
        meta,
        build_parallel_plan(par_geom, dtype, footprint="kb"),
        # host-side dtype conversion (eager on-device converts = one remote
        # compile per shape on axon); float mask instead of bool for the
        # same reason
        jnp.asarray(np.asarray(Ec, np.dtype(dtype))),
        jnp.asarray(np.asarray(Es, np.dtype(dtype))),
        jnp.asarray(flip.astype(np.float32)),
        jnp.asarray(np.asarray(Cc, np.dtype(dtype))),
        jnp.asarray(np.asarray(Cs, np.dtype(dtype))),
    ))


def _project_complex(plan, z, mesh=None, angle_axis="angle", batch_axis=None):
    """parallel_project on a complex batch via (Re, Im) stacking.

    The stack doubles the leading batch, so a batch divisible by the mesh's
    ``batch_axis`` stays divisible — callers pad the complex batch first."""
    stacked = jnp.concatenate([z.real, z.imag], axis=0)
    p = parallel_project(plan, stacked, mesh=mesh, angle_axis=angle_axis,
                         batch_axis=batch_axis)
    B = z.shape[0]
    return p[:B], p[B:]


def _backproject_complex(plan, pr, pi, mesh=None, angle_axis="angle",
                         batch_axis=None):
    stacked = jnp.concatenate([pr, pi], axis=0)
    f = parallel_backproject(plan, stacked, mesh=mesh, angle_axis=angle_axis,
                             batch_axis=batch_axis)
    B = pr.shape[0]
    return jax.lax.complex(f[:B], f[B:])


def fs_nufft_forward(plan: FsPlan, image: jnp.ndarray, mesh=None,
                     angle_axis: str = "angle",
                     batch_axis: str = None) -> jnp.ndarray:
    """(..., N, N) complex → (..., n_spokes, n_samples) complex.

    ``mesh``: spoke-shard the underlying parallel projection (spokes ARE
    the plan's angle axis under the projection-slice theorem); the small
    per-spoke NUDFT matmuls (Ec/Es) and phases stay global."""
    z, restore = _collapse_batch(image.astype(jnp.complex64), 2)
    pr, pi = _project_complex(plan.par_plan, z, mesh, angle_axis, batch_axis)
    fl = plan.flip[None, :, None]
    pr = fl * pr[..., ::-1] + (1.0 - fl) * pr
    pi = fl * pi[..., ::-1] + (1.0 - fl) * pi
    # (p_re + i p_im) · (Ec − i Es), all real matmuls
    kr = jnp.einsum("bas,sm->bam", pr, plan.Ec) + jnp.einsum("bas,sm->bam", pi, plan.Es)
    ki = jnp.einsum("bas,sm->bam", pi, plan.Ec) - jnp.einsum("bas,sm->bam", pr, plan.Es)
    # center-convention phase e^{+i(k_x+k_y)d}
    out_r = kr * plan.Cc - ki * plan.Cs
    out_i = kr * plan.Cs + ki * plan.Cc
    return restore(jax.lax.complex(out_r, out_i))


def fs_nufft_adjoint(plan: FsPlan, kdata: jnp.ndarray, mesh=None,
                     angle_axis: str = "angle",
                     batch_axis: str = None) -> jnp.ndarray:
    """Exact transpose of :func:`fs_nufft_forward` (conjugate-transpose in
    the complex sense: ⟨Ax, y⟩ = ⟨x, A†y⟩ with conjugating inner products)."""
    k, restore = _collapse_batch(kdata.astype(jnp.complex64), 2)
    # conjugate-transpose of the center-convention phase
    kr = k.real * plan.Cc + k.imag * plan.Cs
    ki = k.imag * plan.Cc - k.real * plan.Cs
    # transpose of the (Ec, −Es) block structure
    pr = jnp.einsum("bam,sm->bas", kr, plan.Ec) - jnp.einsum("bam,sm->bas", ki, plan.Es)
    pi = jnp.einsum("bam,sm->bas", ki, plan.Ec) + jnp.einsum("bam,sm->bas", kr, plan.Es)
    fl = plan.flip[None, :, None]
    pr = fl * pr[..., ::-1] + (1.0 - fl) * pr
    pi = fl * pi[..., ::-1] + (1.0 - fl) * pi
    return restore(_backproject_complex(plan.par_plan, pr, pi, mesh,
                                        angle_axis, batch_axis))
