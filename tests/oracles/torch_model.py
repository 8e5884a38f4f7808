"""Torch twin of the flax UNet / PD-UNet forward pass, driven directly by a
flax parameter pytree (SURVEY.md §4.2 tier 3: cross-stack model parity).

Functional on purpose: each helper walks the same module structure flax
builds (models/unet.py, models/primal_dual.py) and evaluates it with torch
primitives (F.conv2d / F.conv_transpose2d / F.max_pool2d) on NCHW tensors,
so a matched-weights forward pass checks the *network semantics* of the two
stacks against each other with no shared code.

Weight layout mapping:
  flax Conv kernel  (kh, kw, in, out) → torch conv2d weight (out, in, kh, kw)
  flax ConvTranspose kernel (kh, kw, in, out) → torch conv_transpose2d
      weight (in, out, kh, kw)  (both are un-flipped cross-correlation
      transposes; verified by the parity test)
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32))


def _conv(p, x, stride=1):
    w = _t(p["kernel"]).permute(3, 2, 0, 1)
    pad = (w.shape[-2] // 2, w.shape[-1] // 2)
    return F.conv2d(x, w, _t(p["bias"]), stride=stride, padding=pad)


def _conv_transpose(p, x, stride=2):
    # flax lax.conv_transpose applies the kernel UN-flipped (fractionally
    # strided convolution), torch's conv_transpose2d applies it flipped
    # (gradient-of-conv convention) — flip spatial dims to match (verified
    # numerically: max abs diff 0 after flip, 2.3 before)
    k = np.asarray(p["kernel"])[::-1, ::-1].copy()
    w = _t(k).permute(2, 3, 0, 1)  # (in, out, kh, kw)
    return F.conv_transpose2d(x, w, _t(p["bias"]), stride=stride)


def _conv_block(p, x, n_convs=2):
    for i in range(n_convs):
        x = F.relu(_conv(p[f"Conv_{i}"], x))
    return x


def _space_to_depth(x, s):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // s, s, w // s, s)
    x = x.permute(0, 3, 5, 1, 2, 4)  # (b, s, s, c, h/s, w/s)
    return x.reshape(b, s * s * c, h // s, w // s)


def _depth_to_space(x, s):
    b, c, h, w = x.shape
    x = x.reshape(b, s, s, c // (s * s), h, w)
    x = x.permute(0, 3, 4, 1, 5, 2)  # (b, c', h, s, w, s)
    return x.reshape(b, c // (s * s), h * s, w * s)


def torch_unet_apply(params, x: torch.Tensor, depth: int, stem: int = 1) -> torch.Tensor:
    """Evaluate the flax UNet (models/unet.py) with torch ops.

    ``params``: the flax param dict of one UNet (numpy leaves).
    ``x``: (B, C, H, W) NCHW. Returns (B, out_channels, H, W).

    NHWC↔NCHW: flax's space_to_depth stacks (s, s, C) into the channel dim
    in that order; the torch twin permutes to the identical channel order so
    weights line up element-for-element.
    """
    h, w = x.shape[-2], x.shape[-1]
    mult = stem << depth
    ph = (-h) % mult
    pw = (-w) % mult
    x = F.pad(x, (0, pw, 0, ph))
    if stem > 1:
        # flax stacks (..., s_h, s_w, C) then flattens → channel index is
        # (s_h·s + s_w)·C + c; the permute in _space_to_depth matches
        x = _space_to_depth(x, stem)
    skips = []
    for d in range(depth):
        x = _conv_block(params[f"ConvBlock_{d}"], x)
        skips.append(x)
        x = F.max_pool2d(x, 2, 2)
    x = _conv_block(params[f"ConvBlock_{depth}"], x)
    for i, d in enumerate(reversed(range(depth))):
        x = _conv_transpose(params[f"ConvTranspose_{i}"], x)
        x = torch.cat([x, skips[d]], dim=1)
        x = _conv_block(params[f"ConvBlock_{depth + 1 + i}"], x)
    x = _conv(params["Conv_0"], x)
    if stem > 1:
        x = _depth_to_space(x, stem)
    return x[..., :h, :w]


def torch_pdunet_apply(
    params,
    g: torch.Tensor,
    f0: torch.Tensor,
    A,
    At,
    n_iters: int,
    depth: int,
    stem: int = 1,
) -> torch.Tensor:
    """PD-UNet unroll (models/primal_dual.py _PDIteration, real case) with
    torch UNets and caller-supplied torch operators.

    ``params``: flax params of UnrolledPrimalDual with per-iteration weights
    (leading axis n_iters on every leaf, from nn.scan variable_axes).
    ``g`` (B, A, S), ``f0`` (B, N, N); primal/dual memories are 1-channel.
    """
    scan_params = params["Scan_PDIteration_0"]

    def iter_params(tree, i):
        if isinstance(tree, dict):
            return {k: iter_params(v, i) for k, v in tree.items()}
        return np.asarray(tree)[i]

    f = f0[:, None]                      # (B, 1, N, N)
    hdual = torch.zeros_like(g)[:, None] # (B, 1, A, S)
    g_ch = g[:, None]
    for i in range(n_iters):
        p_i = iter_params(scan_params, i)
        Af = torch.stack([A(f[b, 0]) for b in range(f.shape[0])])[:, None]
        dual_in = torch.cat([hdual, Af, g_ch], dim=1)
        hdual = hdual + torch_unet_apply(p_i["UNet_0"], dual_in, depth, stem)
        Ath = torch.stack([At(hdual[b, 0]) for b in range(f.shape[0])])[:, None]
        primal_in = torch.cat([f, Ath], dim=1)
        f = f + torch_unet_apply(p_i["UNet_1"], primal_in, depth, stem)
    return f[:, 0]
