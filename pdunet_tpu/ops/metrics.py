"""Image quality metrics (PSNR, SSIM, RMSE) in pure jnp.

The judge metric is PSNR/SSIM vs the reference (BASELINE.json:2; SURVEY.md
§2b C9). scikit-image is absent from the environment (SURVEY.md §0), so SSIM
follows Wang et al. 2004 with the standard 11×11 σ=1.5 Gaussian window —
the same defaults as skimage.metrics.structural_similarity with
gaussian_weights=True, matching common practice in the reference's domain.

All metrics run on device and vmap/jit cleanly (used inside eval loops).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["psnr", "ssim", "rmse", "mse"]


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2, axis=(-2, -1))


def rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(mse(pred, target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range=None) -> jnp.ndarray:
    """PSNR in dB over the trailing two axes; leading axes broadcast.

    ``data_range`` defaults to the per-image peak-to-peak of ``target``.
    """
    if data_range is None:
        data_range = jnp.max(target, axis=(-2, -1)) - jnp.min(target, axis=(-2, -1))
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(mse(pred, target))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode 2D correlation of (B, H, W) with (k, k).

    Precision is pinned to HIGHEST: TPU convolutions default to bf16
    passes, whose ~2⁻⁸ relative error on the moment maps dwarfs SSIM's C2
    stabilizer and corrupts the index (observed as SSIM swinging between
    -0.5 and 0.95 on ~49 dB reconstructions). Metrics must be exact.
    """
    k = win.shape[0]
    return lax.conv_general_dilated(
        x[:, None],
        win[None, None],
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )[:, 0]


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range=None,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over the trailing two axes; leading axes are batch."""
    batch_shape = pred.shape[:-2]
    p = pred.reshape((-1,) + pred.shape[-2:]).astype(jnp.float32)
    t = target.reshape((-1,) + target.shape[-2:]).astype(jnp.float32)
    if data_range is None:
        dr = jnp.max(t, axis=(-2, -1)) - jnp.min(t, axis=(-2, -1))
    else:
        dr = jnp.broadcast_to(jnp.asarray(data_range, jnp.float32), (p.shape[0],))
    c1 = (k1 * dr) ** 2
    c2 = (k2 * dr) ** 2

    win = _gaussian_window(window_size, sigma)
    mu_p = _filter2d(p, win)
    mu_t = _filter2d(t, win)
    mu_pp = _filter2d(p * p, win)
    mu_tt = _filter2d(t * t, win)
    mu_pt = _filter2d(p * t, win)

    # E[x²]−μ² cancels catastrophically in f32 when |x| ≫ data_range (an
    # unconverged net can emit O(1e3) values): the error ~μ²·ε can exceed
    # the C2 stabilizer and push SSIM outside [-1, 1]. True moments always
    # satisfy var ≥ 0 and |cov| ≤ √(var_p·var_t) (Cauchy-Schwarz), so
    # clamping to those bounds is exact for healthy numerics and keeps the
    # index bounded when cancellation hits.
    var_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    var_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    cov_cap = jnp.sqrt(var_p * var_t)
    cov = jnp.clip(mu_pt - mu_p * mu_t, -cov_cap, cov_cap)

    c1 = c1[:, None, None]
    c2 = c2[:, None, None]
    s = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return s.mean(axis=(-2, -1)).reshape(batch_shape)
