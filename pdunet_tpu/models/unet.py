"""2D UNet (flax linen), the shared trunk of the framework (SURVEY.md §2b C5).

One implementation serves all three reference uses: (a) sinogram-domain
upsampler, (b) image-domain FBP post-processor, (c) the primal/dual subnets
inside PD-UNet. Residual connections are added by the *task* models, keeping
this module a plain image-to-image map.

TPU notes: NHWC layout (XLA:TPU native), inputs of arbitrary spatial size are
zero-padded up to a multiple of 2**depth and cropped back (sinograms are
rarely power-of-two shaped), and all convs ride the MXU via
lax.conv_general_dilated under the hood.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["UNet"]


class ConvBlock(nn.Module):
    features: int
    n_convs: int = 2
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_convs):
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = self.act(x)
        return x


class UNet(nn.Module):
    """Encoder-decoder UNet with skip connections.

    Args:
      out_channels: output channel count.
      base_features: features at full resolution; doubled per level.
      depth: number of 2× downsamplings.
      features_cap: ceiling on per-level features.
      dtype: compute dtype (bfloat16 for TPU speed; params stay float32).
    """

    out_channels: int = 1
    base_features: int = 64
    depth: int = 4
    features_cap: int = 512
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    def level_features(self) -> Sequence[int]:
        return [min(self.base_features * (1 << d), self.features_cap) for d in range(self.depth + 1)]

    @nn.compact
    def __call__(self, x):
        # Pad spatial dims up to a multiple of 2**depth, crop on the way out.
        h, w = x.shape[-3], x.shape[-2]
        mult = 1 << self.depth
        ph = (-h) % mult
        pw = (-w) % mult
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)])
        x = x.astype(self.dtype)

        feats = self.level_features()
        skips = []
        for d in range(self.depth):
            x = ConvBlock(feats[d], act=self.act, dtype=self.dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(feats[self.depth], act=self.act, dtype=self.dtype)(x)
        for d in reversed(range(self.depth)):
            x = nn.ConvTranspose(
                feats[d], (2, 2), strides=(2, 2), dtype=self.dtype
            )(x)
            x = jnp.concatenate([x, skips[d]], axis=-1)
            x = ConvBlock(feats[d], act=self.act, dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return x[..., :h, :w, :]
