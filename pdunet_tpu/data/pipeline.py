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
    "interp_upsample_spokes",
    "reverse_spoke_samples",
    "lowdose_poisson_noise",
    "kspace_gaussian_noise",
    "mu_to_hu",
    "hu_to_mu",
    "normalize_ct_window",
]


def reverse_spoke_samples(spokes: jnp.ndarray) -> jnp.ndarray:
    """Map each radial spoke's samples r → -r on the uniform
    [-k_max, k_max) readout grid: ``out[i] = in[(S - i) % S]``.

    This is the sample-order change between a spoke at angle θ and the
    same diameter traversed at θ+π. The lone -k_max sample maps to itself
    (+k_max is off-grid by construction of the half-open grid) — a
    one-edge-sample approximation, acceptable wherever the result feeds a
    network input or an angle-parity canonicalization.
    """
    return jnp.roll(jnp.flip(spokes, axis=-1), 1, axis=-1)


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


def kspace_gaussian_noise(
    key: jax.Array, kspace: jnp.ndarray, snr_db: float
) -> jnp.ndarray:
    """Complex Gaussian measurement noise for MRI k-space (SURVEY.md §2b C4:
    "MRI: magnitude/complex" — the standard radial-MRI analogue of the CT
    transmission noise in :func:`lowdose_poisson_noise`).

    Thermal receiver noise in MRI is i.i.d. circularly-symmetric complex
    Gaussian, identical on every k-space sample regardless of trajectory.
    ``snr_db`` parameterizes it relative to the *measured data's* RMS,
    per slice: E|n|² = RMS(|g|)² · 10^(−snr_db/10), so SNR is a power
    ratio over the sampled spokes. ``snr_db <= 0`` disables the noise
    (the noiseless default of every config; TrainConfig.kspace_snr_db).

    kspace: (..., A, S) complex, last two dims = (spokes, readout).
    """
    if snr_db <= 0:
        return kspace
    power = jnp.mean(jnp.abs(kspace) ** 2, axis=(-2, -1), keepdims=True)
    sigma = jnp.sqrt(power) * (10.0 ** (-snr_db / 20.0))
    # complex64 normal: unit total variance (0.5 per component), so sigma
    # scales the complex magnitude directly
    noise = jax.random.normal(key, kspace.shape, dtype=kspace.dtype)
    return kspace + sigma.astype(kspace.dtype) * noise


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


def interp_upsample_spokes(
    sparse: jnp.ndarray,
    sparse_angles: tuple,
    dense_angles: tuple,
) -> jnp.ndarray:
    """Angular interpolation of radial k-space spokes onto a denser spoke
    set — the radial-MRI analogue of :func:`interp_upsample_angles`
    (the paper's "sinogram upsampling ... for undersampled CT *and radial
    MRI*"; SURVEY.md §2b C4, §3.3).

    Golden-angle undersampling keeps a *prefix* of the spoke sequence
    (geometry.py RadialGeometry.subsample), so the missing spokes interleave
    the kept ones in angle rather than in index. Each target spoke is the
    angular-linear blend of its two bracketing source spokes after reducing
    every angle mod π, where a spoke at θ+π is the sample-reversed spoke at
    θ (its readout traverses the same k-space diameter backwards). Source
    spokes whose angle matches a target exactly (the shared prefix) pass
    through unchanged.

    All neighbor indices/weights/flip parities are computed statically from
    the angle tuples (host numpy at trace time); the on-device work is two
    small spoke-axis gathers + a lerp, jit-safe with static shapes.

    Args: sparse (..., A_s, S) complex; returns (..., A_d, S).
    """
    import numpy as np

    phi_s = np.asarray(sparse_angles) % (2.0 * np.pi)
    phi_d = np.asarray(dense_angles) % (2.0 * np.pi)
    flip_s = phi_s >= np.pi
    flip_d = phi_d >= np.pi
    red_s = phi_s % np.pi
    red_d = phi_d % np.pi

    order = np.argsort(red_s, kind="stable")
    grid = red_s[order]
    n_s = len(grid)

    pos = np.searchsorted(grid, red_d)            # right neighbor position
    left = (pos - 1) % n_s
    right = pos % n_s
    phi_l = grid[left] - np.where(pos == 0, np.pi, 0.0)      # wrap below
    phi_r = grid[right] + np.where(pos == n_s, np.pi, 0.0)   # wrap above
    span = np.maximum(phi_r - phi_l, 1e-12)
    t = np.clip((red_d - phi_l) / span, 0.0, 1.0)
    # exact hits (shared prefix): snap to the matching source spoke
    exact_r = np.isclose(red_d, grid[right] % np.pi, atol=1e-9)
    t = np.where(exact_r, 1.0, t)

    idx_l = order[left]
    idx_r = order[right]
    # A neighbor reached by wrapping across the π boundary (pos==0 below,
    # pos==n_s above) sits at rho±π relative to its stored orientation, so
    # the wrap itself contributes one more sample-reversal parity on top of
    # the spoke/target flip parities. Without it, wrap-spanning dense spokes
    # blend a backwards readout (observed 17–32% relative error vs ~0.1%).
    need_flip_l = flip_s[idx_l] ^ flip_d ^ (pos == 0)
    need_flip_r = flip_s[idx_r] ^ flip_d ^ (pos == n_s)

    rev = reverse_spoke_samples(sparse)

    def pick(idx, flips):
        base = jnp.take(sparse, jnp.asarray(idx), axis=-2)
        alt = jnp.take(rev, jnp.asarray(idx), axis=-2)
        mask = jnp.asarray(flips)[..., :, None]
        return jnp.where(mask, alt, base)

    w_r = jnp.asarray(t, jnp.float32)[..., :, None]
    return (1.0 - w_r) * pick(idx_l, need_flip_l) + w_r * pick(idx_r, need_flip_r)
