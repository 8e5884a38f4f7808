"""Training losses (SURVEY.md §2b C9).

The reference trains with L1 on reconstructed images, and for
sinogram-domain nets an L1 on the predicted dense sinogram plus an image
loss through a differentiable FBP (paper, medium confidence — SURVEY.md
§3.3). All losses are plain jnp reductions; the differentiability of the
FBP path comes from the operators' custom_vjp.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1", "l2", "charbonnier"]


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    # |d|² instead of d² so complex residuals (radial MRI) reduce to a real
    # scalar; identical to (pred-target)² for real inputs.
    return jnp.mean(jnp.abs(pred - target) ** 2)


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Smooth L1 variant; numerically kinder than |·| at zero under bf16."""
    return jnp.mean(jnp.sqrt(jnp.abs(pred - target) ** 2 + eps * eps))
