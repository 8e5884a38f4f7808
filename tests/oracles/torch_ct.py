"""Independent torch-CPU CT oracle (SURVEY.md §4.2 tier 3; BASELINE.json:2
"PSNR/SSIM vs reference PyTorch").

A slow-but-simple parallel-beam projector and ramp-filtered backprojection
written against the torch stack only — no jax, no shared code with
pdunet_tpu. Rays are sampled with ``torch.nn.functional.grid_sample``
(torch's own bilinear interpolator, the same primitive family torch-radon's
texture sampler uses), the ramp filter is the standard discrete Ram-Lak
impulse response via ``torch.fft``. Used by tests/test_torch_oracle.py as
the cross-implementation numerical anchor for the jax operators.

Conventions match pdunet_tpu/ops/radon/parallel.py's public contract:
images (N, N) with row j ↦ +y and column i ↦ +x, sinogram (A, S), ray at
angle θ: point = s·(cosθ, sinθ) + t·(−sinθ, cosθ).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def torch_parallel_project(
    image: torch.Tensor,
    angles,
    det_count: int,
    det_spacing: float = 1.0,
    pixel_spacing: float = 1.0,
    oversample: int = 2,
) -> torch.Tensor:
    """Ray-driven line integrals. image (N, N) float32 → sinogram (A, S)."""
    image = image.to(torch.float32)
    N = image.shape[-1]
    angles = torch.as_tensor(angles, dtype=torch.float32)
    A = angles.numel()
    S = det_count
    s = (torch.arange(S, dtype=torch.float32) - (S - 1) / 2.0) * det_spacing
    half_len = N * pixel_spacing * math.sqrt(2.0) / 2.0
    n_t = int(2 * half_len / (pixel_spacing / oversample)) + 1
    t = torch.linspace(-half_len, half_len, n_t)
    dt = float(t[1] - t[0]) if n_t > 1 else 1.0

    cs, sn = torch.cos(angles), torch.sin(angles)
    # (A, S, T) physical coordinates of every sample point
    x = s[None, :, None] * cs[:, None, None] - t[None, None, :] * sn[:, None, None]
    y = s[None, :, None] * sn[:, None, None] + t[None, None, :] * cs[:, None, None]
    # grid_sample normalized coords: align_corners=True maps ±1 → the
    # centers of the edge pixels, i.e. array index 0 and N-1
    half_extent = (N - 1) / 2.0 * pixel_spacing
    grid = torch.stack([x / half_extent, y / half_extent], dim=-1)  # (A,S,T,2)
    vals = F.grid_sample(
        image[None, None],          # (1, 1, N, N): H index = y, W index = x
        grid.reshape(1, A, S * n_t, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).reshape(A, S, n_t)
    return vals.sum(dim=-1) * dt


def torch_ramp_filter(sino: torch.Tensor, det_spacing: float = 1.0) -> torch.Tensor:
    """Discrete Ram-Lak filtering along the detector axis (Kak-Slaney 3.29:
    h[0]=1/(4ds²), h[n]=0 for even n, h[n]=−1/(π²n²ds²) for odd n)."""
    S = sino.shape[-1]
    size = 1
    while size < 2 * S:
        size *= 2
    n = torch.arange(-S + 1, S, dtype=torch.float32)
    h = torch.zeros_like(n)
    h[n == 0] = 1.0 / (4.0 * det_spacing**2)
    odd = (n.to(torch.int64) % 2) != 0
    h[odd] = -1.0 / (math.pi**2 * n[odd] ** 2 * det_spacing**2)
    kernel = torch.zeros(size)
    kernel[: 2 * S - 1] = h
    H = torch.fft.rfft(kernel)
    p = torch.zeros(sino.shape[:-1] + (size,), dtype=torch.float32)
    p[..., :S] = sino
    filtered = torch.fft.irfft(torch.fft.rfft(p, dim=-1) * H, n=size, dim=-1)
    # linear convolution: output sample k aligns at offset S-1
    return filtered[..., S - 1 : S - 1 + S] * det_spacing


def torch_parallel_fbp(
    sino: torch.Tensor,
    angles,
    image_size: int,
    det_spacing: float = 1.0,
    pixel_spacing: float = 1.0,
) -> torch.Tensor:
    """Ramp-filtered backprojection. sino (A, S) → image (N, N).

    Backprojection samples the filtered sinogram at s = x·cosθ + y·sinθ per
    pixel with grid_sample (pixel-driven — deliberately the *other*
    discretization family from the ray-driven forward, and from the jax
    factored path)."""
    sino = sino.to(torch.float32)
    A, S = sino.shape
    N = image_size
    angles = torch.as_tensor(angles, dtype=torch.float32)
    filtered = torch_ramp_filter(sino, det_spacing)

    c = (N - 1) / 2.0
    idx = torch.arange(N, dtype=torch.float32)
    xs = (idx - c) * pixel_spacing
    X, Y = torch.meshgrid(xs, xs, indexing="xy")  # X varies along columns
    cs, sn = torch.cos(angles), torch.sin(angles)
    s_phys = X[None] * cs[:, None, None] + Y[None] * sn[:, None, None]  # (A,N,N)
    half_extent = (S - 1) / 2.0 * det_spacing
    gx = s_phys / half_extent
    # sample each angle's filtered row: treat filtered as (A, 1, 1, S)
    grid = torch.stack([gx, torch.zeros_like(gx)], dim=-1).reshape(A, 1, N * N, 2)
    vals = F.grid_sample(
        filtered[:, None, None, :],
        grid,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).reshape(A, N, N)
    return vals.sum(dim=0) * math.pi / A


def torch_fan_project(
    image: torch.Tensor,
    angles,
    det_count: int,
    source_distance: float,
    det_distance: float,
    det_spacing: float,
    pixel_spacing: float = 1.0,
    oversample: int = 2,
) -> torch.Tensor:
    """Ray-driven fan-beam line integrals (flat detector).

    The fan ray at (β, u) is the full line with parallel coordinates
    θ = β + γ, s = R·sinγ, γ = atan2(u, R + D) — sampling that line with
    grid_sample is an independent discretization family from pdunet_tpu's
    rebinning composition (extended-grid parallel projector + 2-banded
    detector matmul). image (N, N) float32 → sinogram (A, S).
    """
    image = image.to(torch.float32)
    N = image.shape[-1]
    betas = torch.as_tensor(angles, dtype=torch.float32)
    A = betas.numel()
    S = det_count
    u = (torch.arange(S, dtype=torch.float32) - (S - 1) / 2.0) * det_spacing
    gamma = torch.atan2(u, torch.tensor(float(source_distance + det_distance)))
    theta = betas[:, None] + gamma[None, :]                    # (A, S)
    s = (source_distance * torch.sin(gamma))[None, :].expand(A, S)

    half_len = N * pixel_spacing * math.sqrt(2.0) / 2.0
    n_t = int(2 * half_len / (pixel_spacing / oversample)) + 1
    t = torch.linspace(-half_len, half_len, n_t)
    dt = float(t[1] - t[0]) if n_t > 1 else 1.0

    cs, sn = torch.cos(theta), torch.sin(theta)                # (A, S)
    x = s[..., None] * cs[..., None] - t * sn[..., None]       # (A, S, T)
    y = s[..., None] * sn[..., None] + t * cs[..., None]
    half_extent = (N - 1) / 2.0 * pixel_spacing
    grid = torch.stack([x / half_extent, y / half_extent], dim=-1)
    vals = F.grid_sample(
        image[None, None],
        grid.reshape(1, A, S * n_t, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).reshape(A, S, n_t)
    return vals.sum(dim=-1) * dt
