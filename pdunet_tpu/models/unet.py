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

__all__ = ["UNet", "space_to_depth", "depth_to_space"]


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


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(..., H, W, C) → (..., H/s, W/s, C·s²) by 2D pixel-unshuffle."""
    *b, h, w, c = x.shape
    x = x.reshape(*b, h // s, s, w // s, s, c)
    x = jnp.swapaxes(x, -4, -3)  # (..., H/s, W/s, s, s, C)
    return x.reshape(*b, h // s, w // s, s * s * c)


def depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    *b, h, w, c = x.shape
    x = x.reshape(*b, h, w, s, s, c // (s * s))
    x = jnp.swapaxes(x, -4, -3)  # (..., H, s, W, s, C)
    return x.reshape(*b, h * s, w * s, c // (s * s))


class UNet(nn.Module):
    """Encoder-decoder UNet with skip connections.

    Args:
      out_channels: output channel count.
      base_features: features at full resolution; doubled per level.
      depth: number of 2× downsamplings below the stem level.
      stem: space-to-depth patch size (1 = classic UNet). With ``stem=s>1``
        the input is pixel-unshuffled by s before the conv pyramid and the
        output pixel-shuffled back, so every conv runs at H/s × W/s with
        s× wider channels. On TPU this is the difference between level-0
        convs at 25% MXU lane utilization (≤32 output channels padded to
        the 128-wide vector lanes) and full tiles: profiling shows the
        full-resolution encoder/decoder/1×1 ops are ~70% of UNet device
        time at stem=1. ``(stem=2, depth=d)`` has the same bottleneck
        resolution and feature count as ``(stem=1, depth=d+1)``.
      features_cap: ceiling on per-level features.
      dtype: compute dtype (bfloat16 for TPU speed; params stay float32).
      upsample: decoder 2× upsampling op. "convtranspose" (default, the
        classic UNet choice) lowers on TPU to an input-dilated convolution;
        "shuffle" computes the same linear family — each pixel of the 2×2
        output block is an independent linear map of the input pixel, with
        an identical parameter count — as a 1×1 conv to 4·features followed
        by depth_to_space, which lowers to a plain MXU matmul with no
        dilation. Checkpoints are NOT interchangeable across the two (param
        shapes differ).
    """

    out_channels: int = 1
    base_features: int = 64
    depth: int = 4
    stem: int = 1
    features_cap: int = 512
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32
    upsample: str = "convtranspose"

    def level_features(self) -> Sequence[int]:
        # follow the double-per-octave rule from full resolution: the stem
        # level (already log2(stem) octaves down) starts at base·stem
        return [
            min(self.base_features * self.stem * (1 << d), self.features_cap)
            for d in range(self.depth + 1)
        ]

    @nn.compact
    def __call__(self, x):
        # Pad spatial dims up to a multiple of stem·2**depth, crop on the
        # way out.
        h, w = x.shape[-3], x.shape[-2]
        mult = self.stem << self.depth
        ph = (-h) % mult
        pw = (-w) % mult
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)])
        x = x.astype(self.dtype)
        if self.stem > 1:
            x = space_to_depth(x, self.stem)

        feats = self.level_features()
        skips = []
        for d in range(self.depth):
            x = ConvBlock(feats[d], act=self.act, dtype=self.dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(feats[self.depth], act=self.act, dtype=self.dtype)(x)
        for d in reversed(range(self.depth)):
            if self.upsample == "shuffle":
                x = nn.Conv(feats[d] * 4, (1, 1), dtype=self.dtype)(x)
                x = depth_to_space(x, 2)
            elif self.upsample == "convtranspose":
                x = nn.ConvTranspose(
                    feats[d], (2, 2), strides=(2, 2), dtype=self.dtype
                )(x)
            else:
                raise ValueError(
                    f"unknown upsample {self.upsample!r}; "
                    "options: convtranspose, shuffle"
                )
            x = jnp.concatenate([x, skips[d]], axis=-1)
            x = ConvBlock(feats[d], act=self.act, dtype=self.dtype)(x)
        x = nn.Conv(self.out_channels * self.stem * self.stem, (1, 1), dtype=self.dtype)(x)
        if self.stem > 1:
            x = depth_to_space(x, self.stem)
        x = x.astype(jnp.float32)
        return x[..., :h, :w, :]
