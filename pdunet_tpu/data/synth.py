"""On-device phantom synthesis (pure jnp, jit/vmap-able).

TPU-native replacement for the reference's CPU DataLoader workers
(SURVEY.md §3.1 "PROCESS BOUNDARY"): training data is synthesized *on the
chip* inside the jitted step — random ellipse phantoms and their sinograms —
so there is no host↔device input boundary at all for the synthetic regime.
File-backed medical data goes through :mod:`pdunet_tpu.data.datasets`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_ellipse_params", "rasterize_jnp", "random_phantom_batch"]


def sample_ellipse_params(
    key: jax.Array, n_ellipses: int, radius: float, nonneg: bool = False
) -> jnp.ndarray:
    """Sample (n_ellipses, 6) ellipse params [rho, a, b, x0, y0, phi].

    ``nonneg=True`` draws intensities from [0.1, 1.0] instead of [-1, 1] —
    the MRI-magnitude regime, where a signed density would make |image| an
    ill-posed target and an unlucky all-negative draw yields a zero image
    (which breaks peak-normalized PSNR).
    """
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    rho = jax.random.uniform(
        k1, (n_ellipses,),
        minval=0.1 if nonneg else -1.0, maxval=1.0,
    )
    a = jax.random.uniform(k2, (n_ellipses,), minval=0.08, maxval=0.5) * radius
    b = jax.random.uniform(k3, (n_ellipses,), minval=0.08, maxval=0.5) * radius
    r0 = jax.random.uniform(k4, (n_ellipses,), minval=0.0, maxval=0.6) * radius
    ang = jax.random.uniform(k5, (n_ellipses,), minval=0.0, maxval=2 * jnp.pi)
    phi = jax.random.uniform(k6, (n_ellipses,), minval=0.0, maxval=jnp.pi)
    return jnp.stack([rho, a, b, r0 * jnp.cos(ang), r0 * jnp.sin(ang), phi], axis=1)


def rasterize_jnp(
    params: jnp.ndarray, image_size: int, pixel_spacing: float = 1.0, supersample: int = 2
) -> jnp.ndarray:
    """Rasterize (n_ellipses, 6) params to an (N, N) image on device."""
    N, ss = image_size, supersample
    coords = (jnp.arange(N * ss) + 0.5) / ss - 0.5
    c = (N - 1) / 2.0
    xy = (coords - c) * pixel_spacing
    X = xy[None, :]  # broadcast over rows
    Y = xy[:, None]

    def one(ell):
        rho, a, b, x0, y0, phi = ell
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        xr = (X - x0) * cp + (Y - y0) * sp
        yr = -(X - x0) * sp + (Y - y0) * cp
        return rho * ((xr / a) ** 2 + (yr / b) ** 2 <= 1.0)

    fine = jnp.sum(jax.vmap(one)(params), axis=0)
    return fine.reshape(N, ss, N, ss).mean(axis=(1, 3)).astype(jnp.float32)


def random_phantom_batch(
    key: jax.Array,
    batch_size: int,
    image_size: int,
    n_ellipses: int = 8,
    pixel_spacing: float = 1.0,
    supersample: int = 2,
    nonneg: bool = False,
) -> jnp.ndarray:
    """Batch of random ellipse phantoms (B, N, N), fully on device."""
    radius = 0.45 * image_size * pixel_spacing

    def one(k):
        return rasterize_jnp(
            sample_ellipse_params(k, n_ellipses, radius, nonneg=nonneg),
            image_size,
            pixel_spacing,
            supersample,
        )

    return jax.vmap(one)(jax.random.split(key, batch_size))
