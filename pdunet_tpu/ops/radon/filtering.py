"""Sinogram ramp filtering for FBP.

Replaces torch-radon's ``filter_sinogram`` (cuFFT ramp filter; SURVEY.md §2c):
on TPU the XLA FFT is already fused into the surrounding jit region, so no
custom kernel is needed (BASELINE.json:5 "fuse the ramp-filter FBP").

The ramp is realized through the standard band-limited discrete impulse
response (Kak & Slaney eq. 61) rather than a raw |f| multiplier — this avoids
the DC bias of the naive frequency-domain ramp:

    h[0] = 1/(4 δ_s²),  h[n odd] = -1/(π n δ_s)²,  h[n even] = 0.

Supported windows match torch-radon / skimage: ramp (= ram-lak),
shepp-logan, cosine, hamming, hann.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["ramp_kernel", "filter_sinogram", "FILTERS"]

FILTERS = ("ramp", "ram-lak", "shepp-logan", "cosine", "hamming", "hann")


def _next_pow2(n: int) -> int:
    return 1 << max(6, (n - 1).bit_length())


@functools.lru_cache(maxsize=32)
def _filter_response(det_count: int, det_spacing: float, filter_name: str):
    """Frequency response (rfft of padded impulse response × window), cached.

    Returns a NumPy array; converted to jnp at trace time (becomes a
    constant in the compiled executable).
    """
    if filter_name not in FILTERS:
        raise ValueError(f"unknown filter {filter_name!r}; choose from {FILTERS}")
    pad = _next_pow2(2 * det_count)
    n = np.concatenate([np.arange(0, pad // 2 + 1), np.arange(pad // 2 - 1, 0, -1)])
    h = np.zeros(pad, np.float64)
    h[0] = 1.0 / (4.0 * det_spacing**2)
    odd = n % 2 == 1
    h[odd] = -1.0 / (np.pi * n[odd] * det_spacing) ** 2
    H = np.fft.rfft(h).real  # impulse response is even → real spectrum

    f = np.arange(pad // 2 + 1) / pad  # cycles/sample, Nyquist = 0.5
    fh = f / 0.5
    name = "ramp" if filter_name == "ram-lak" else filter_name
    if name == "ramp":
        w = np.ones_like(fh)
    elif name == "shepp-logan":
        x = np.pi * fh / 2.0
        w = np.ones_like(fh)
        w[1:] = np.sin(x[1:]) / x[1:]
    elif name == "cosine":
        w = np.cos(np.pi * fh / 2.0)
    elif name == "hamming":
        w = 0.54 + 0.46 * np.cos(np.pi * fh)
    elif name == "hann":
        w = 0.5 * (1.0 + np.cos(np.pi * fh))
    return (H * w).astype(np.float32), pad


def ramp_kernel(det_count: int, det_spacing: float = 1.0, filter_name: str = "ramp"):
    """Expose the cached frequency response (for tests / inspection)."""
    H, pad = _filter_response(det_count, float(det_spacing), filter_name)
    return jnp.asarray(H), pad


def filter_sinogram(
    sino: jnp.ndarray, det_spacing: float = 1.0, filter_name: str = "ramp"
) -> jnp.ndarray:
    """Apply the ramp (or windowed) filter along the detector axis.

    sino (..., A, S) → filtered sinogram of the same shape. Linear in the
    input (its transpose is itself — the impulse response is even), so FBP
    built from it stays exactly differentiable.
    """
    S = sino.shape[-1]
    H, pad = _filter_response(S, float(det_spacing), filter_name)
    Hj = jnp.asarray(H, dtype=jnp.float32)
    spec = jnp.fft.rfft(sino.astype(jnp.float32), n=pad, axis=-1)
    filtered = jnp.fft.irfft(spec * Hj, n=pad, axis=-1)[..., :S]
    return (filtered * det_spacing).astype(sino.dtype)
