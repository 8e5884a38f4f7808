"""Sinogram undersampling / upsampling transforms and noise models.

Reproduces the reference's data pipeline capabilities (SURVEY.md §2b C4;
BASELINE.json:5 "reproduce the reference's sinogram undersampling/upsampling
data pipeline"): dense sinogram synthesis happens through the differentiable
projectors; this module provides the angular subsampling, the naive
dense-grid re-expansion used as network input for the upsampling task
(paper §method), low-dose Poisson noise, and CT value normalization.

Everything is pure jnp with static shapes — usable inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "subsample_angles",
    "interp_upsample_angles",
    "lowdose_poisson_noise",
    "mu_to_hu",
    "hu_to_mu",
    "normalize_ct_window",
]

MU_WATER = 0.02  # 1/mm, standard ~70 keV attenuation of water


def subsample_angles(sino: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Keep every ``factor``-th angle: (..., A, S) → (..., A//factor, S)."""
    return sino[..., ::factor, :]


def interp_upsample_angles(
    sparse: jnp.ndarray, factor: int, angular_coverage: float = 1.0
) -> jnp.ndarray:
    """Linear re-expansion of a sparse sinogram to the dense angle grid.

    Dense angle index ``i`` maps to fractional sparse index ``i / factor``;
    values are linearly interpolated between neighbouring measured angles.
    For a full scan (``angular_coverage == 1``) the final segment past the
    last measured angle wraps to the first angle with the detector axis
    flipped: p(θ+π, s) = p(θ, −s) (parallel-beam symmetry), the correct
    periodic extension over [0, π). For limited-angle scans
    (``angular_coverage < 1``) that wrap would interpolate across a
    non-adjacent angular gap, so the tail clamps to the last measured angle
    instead (nearest extrapolation).
    """
    A_sp = sparse.shape[-2]
    A_dense = A_sp * factor
    pos = jnp.arange(A_dense) / factor
    lo = jnp.floor(pos).astype(jnp.int32)
    w = (pos - lo)[:, None]
    hi = lo + 1
    past_end = hi >= A_sp
    if angular_coverage >= 1.0:
        # neighbor above; wrap to angle 0 with detector flip past the end
        hi_c = jnp.where(past_end, 0, hi)
        lo_v = jnp.take(sparse, lo, axis=-2)
        hi_v = jnp.take(sparse, hi_c, axis=-2)
        hi_v = jnp.where(past_end[:, None], jnp.flip(hi_v, axis=-1), hi_v)
    else:
        hi_c = jnp.where(past_end, A_sp - 1, hi)
        lo_v = jnp.take(sparse, lo, axis=-2)
        hi_v = jnp.take(sparse, hi_c, axis=-2)
    return (1.0 - w) * lo_v + w * hi_v


def lowdose_poisson_noise(
    key: jax.Array, sino: jnp.ndarray, photons_per_ray: float = 1e5
) -> jnp.ndarray:
    """Low-dose CT transmission noise (SURVEY.md §2b C4; BASELINE config 4).

    Simulates photon counting: I = Poisson(I0·exp(−p)), returns −log(I/I0).
    Uses the Gaussian approximation of Poisson (valid for counts ≳ 20,
    always true at clinically relevant doses) so it stays vectorized and
    reparameterization-friendly on TPU.
    """
    i_expected = photons_per_ray * jnp.exp(-sino)
    noise = jax.random.normal(key, sino.shape) * jnp.sqrt(i_expected)
    i_noisy = jnp.maximum(i_expected + noise, 1.0)
    return -jnp.log(i_noisy / photons_per_ray)


def mu_to_hu(mu: jnp.ndarray, mu_water: float = MU_WATER) -> jnp.ndarray:
    return 1000.0 * (mu - mu_water) / mu_water


def hu_to_mu(hu: jnp.ndarray, mu_water: float = MU_WATER) -> jnp.ndarray:
    return mu_water * (1.0 + hu / 1000.0)


def normalize_ct_window(
    img: jnp.ndarray, center: float = 0.0, width: float = 2000.0
) -> jnp.ndarray:
    """Window a HU image into [0, 1] (display/loss normalization)."""
    lo = center - width / 2.0
    return jnp.clip((img - lo) / width, 0.0, 1.0)
