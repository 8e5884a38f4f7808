"""Unrolled primal-dual reconstruction models (SURVEY.md §2b C6-C7).

Implements both:

* **Learned Primal-Dual (LPD)** — Adler & Öktem 2018: unrolled PDHG with
  small 3-conv/32-filter PReLU primal & dual nets and 5-channel memories.
* **Primal-Dual UNet** — the reference paper's contribution
  (arXiv:2112.13443, named at reference README.md:3): the same unroll where
  dual (sinogram-domain) and primal (image-domain) nets are UNets, with
  fewer iterations (BASELINE.json:5 "dual UNet on sinograms, primal UNet on
  images, projection operators stitching the two domains").

Per iteration (operator coupling through memory channel 0):

    h ← h + DualNet([h, A f₀ᶜʰ, g])
    f ← f + PrimalNet([f, A† h₀ᶜʰ])

TPU-native structure (BASELINE.json:5 "one jit'd lax.scan so intermediates
never leave HBM"): the unroll is ``flax.linen.scan`` over the iteration axis
(per-iteration parameters by default, like LPD) with ``nn.remat`` on the
body, so activations of the N-deep double-UNet unroll are rematerialized in
the backward pass instead of living in HBM.

Operators enter as plain callables on (..., H, W) arrays — models never see
geometry internals. Complex-valued operators (radial MRI) are supported via
the ``complex_ops`` flag: network channels are (Re, Im) pairs and operator
inputs/outputs are packed/unpacked accordingly.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from pdunet_tpu.models.unet import UNet

__all__ = ["ConvNet", "UnrolledPrimalDual", "make_lpd", "make_pdunet"]


class ConvNet(nn.Module):
    """The small LPD subnet: n_layers 3×3 convs, PReLU, linear output."""

    out_channels: int
    features: int = 32
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for _ in range(self.n_layers - 1):
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.PReLU()(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def _complex_to_channels(z: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) complex → (..., H, W, 2) real."""
    return jnp.stack([z.real, z.imag], axis=-1)


def _channels_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0] + 1j * x[..., 1]


class _PDIteration(nn.Module):
    """One primal-dual iteration; scanned over the unroll axis."""

    A: Callable
    At: Callable
    make_dual: Callable[[], nn.Module]
    make_primal: Callable[[], nn.Module]
    complex_ops: bool = False

    @nn.compact
    def __call__(self, carry, _):
        f, h, g = carry
        if self.complex_ops:
            Af = _complex_to_channels(self.A(_channels_to_complex(f[..., 0:2])))
        else:
            Af = self.A(f[..., 0])[..., None]
        h = h + self.make_dual()(jnp.concatenate([h, Af, g], axis=-1))
        if self.complex_ops:
            Ath = _complex_to_channels(self.At(_channels_to_complex(h[..., 0:2])))
        else:
            Ath = self.At(h[..., 0])[..., None]
        f = f + self.make_primal()(jnp.concatenate([f, Ath], axis=-1))
        return (f, h, g), None


class UnrolledPrimalDual(nn.Module):
    """Generic unrolled primal-dual network (LPD and PD-UNet are instances).

    Call with measurement ``g`` (B, A, S[, measurement channels]) and initial
    image ``f0`` (B, N, N[, ...]); returns the reconstructed image
    (B, N, N) real — or (B, N, N) complex when ``complex_ops``.
    """

    A: Callable
    At: Callable
    make_dual: Callable[[], nn.Module]
    make_primal: Callable[[], nn.Module]
    n_iters: int = 4
    primal_channels: int = 1
    dual_channels: int = 1
    share_weights: bool = False
    complex_ops: bool = False
    #: rematerialize the iteration body during backward. ON trades ~30%
    #: train-step time for activation memory (needed beyond single-chip
    #: HBM); OFF stores the unroll's activations (a few hundred MB at the
    #: shipped 256²/batch-32 scale — measured train-step roofline moves
    #: from the 4x-forward remat bound to the 3x fwd+bwd bound).
    #: Default OFF, matching ModelConfig.remat — direct construction and
    #: the config-driven path must agree (a silent 30% train-step slowdown
    #: otherwise).
    remat: bool = False

    @nn.compact
    def __call__(self, g, f0):
        step = 2 if self.complex_ops else 1
        if self.complex_ops:
            g_ch = _complex_to_channels(g)
            f = jnp.tile(_complex_to_channels(f0), (1,) * f0.ndim + (self.primal_channels,))
            h = jnp.zeros(g.shape + (step * self.dual_channels,), jnp.float32)
        else:
            g_ch = g[..., None]
            f = jnp.tile(f0[..., None], (1,) * f0.ndim + (self.primal_channels,))
            h = jnp.zeros(g.shape + (self.dual_channels,), jnp.float32)

        body_cls = nn.remat(_PDIteration) if self.remat else _PDIteration
        if self.share_weights:
            scan = nn.scan(
                body_cls,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=self.n_iters,
            )
        else:
            scan = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.n_iters,
            )
        body = scan(
            A=self.A,
            At=self.At,
            make_dual=self.make_dual,
            make_primal=self.make_primal,
            complex_ops=self.complex_ops,
        )
        (f, _, _), _ = body((f, h, g_ch), None)
        if self.complex_ops:
            return _channels_to_complex(f[..., 0:2])
        return f[..., 0]


def make_lpd(
    A: Callable,
    At: Callable,
    n_iters: int = 10,
    features: int = 32,
    primal_channels: int = 5,
    dual_channels: int = 5,
    complex_ops: bool = False,
    dtype=jnp.float32,
    remat: bool = False,
    upsample: str = "convtranspose",
) -> UnrolledPrimalDual:
    """Learned Primal-Dual with the Adler & Öktem defaults (SURVEY.md C6)."""
    step = 2 if complex_ops else 1
    return UnrolledPrimalDual(
        A=A,
        At=At,
        make_dual=lambda: ConvNet(step * dual_channels, features, dtype=dtype),
        make_primal=lambda: ConvNet(step * primal_channels, features, dtype=dtype),
        n_iters=n_iters,
        primal_channels=primal_channels,
        dual_channels=dual_channels,
        complex_ops=complex_ops,
        remat=remat,
    )


def make_pdunet(
    A: Callable,
    At: Callable,
    n_iters: int = 4,
    base_features: int = 32,
    depth: int = 3,
    stem: int = 1,
    complex_ops: bool = False,
    dtype=jnp.float32,
    remat: bool = False,
    upsample: str = "convtranspose",
) -> UnrolledPrimalDual:
    """Primal-Dual UNet — the reference paper's model (SURVEY.md C7)."""
    step = 2 if complex_ops else 1
    return UnrolledPrimalDual(
        A=A,
        At=At,
        make_dual=lambda: UNet(
            out_channels=step, base_features=base_features, depth=depth,
            stem=stem, dtype=dtype, upsample=upsample
        ),
        make_primal=lambda: UNet(
            out_channels=step, base_features=base_features, depth=depth,
            stem=stem, dtype=dtype, upsample=upsample
        ),
        n_iters=n_iters,
        primal_channels=1,
        dual_channels=1,
        remat=remat,
        complex_ops=complex_ops,
    )
