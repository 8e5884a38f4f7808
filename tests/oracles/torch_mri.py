"""Independent torch-CPU radial-MRI oracle (SURVEY.md §4.2 tier 3;
BASELINE.json:2 "PSNR/SSIM vs reference PyTorch" — the radial leg).

An exact type-2/type-1 non-uniform DFT written against the torch stack
only — no jax, no shared code with pdunet_tpu. On the tiny grids the
parity tests use, the explicit exp(−i k·x) matmul IS the definition the
KB-gridding NUFFT approximates (torchkbnufft validates itself the same
way), so this anchors both the trajectory conventions and the complex
adjoint pairing cross-stack.

Conventions mirror pdunet_tpu/ops/nufft/nufft.py's public contract:
images (N, N) complex, k-space (n_spokes, n_samples) complex, spoke k at
angle k·GOLDEN_ANGLE, readout r uniform over [−k_max, k_max) with
k_max = π/pixel_spacing, A(f)[m] = Σ_x f[x]·exp(−i k_m·(x−c)), c = N//2.
"""

from __future__ import annotations

import math

import torch


def torch_radial_kcoords(
    n_spokes: int,
    samples_per_spoke: int,
    spoke_angles,
    pixel_spacing: float = 1.0,
) -> tuple[torch.Tensor, torch.Tensor]:
    """Flattened (kx, ky) of every (spoke, readout) sample, f64."""
    k_max = math.pi / pixel_spacing
    n_ro = samples_per_spoke
    r = (torch.arange(n_ro, dtype=torch.float64) - n_ro / 2.0) * (
        2.0 * k_max / n_ro
    )
    phis = torch.as_tensor(spoke_angles, dtype=torch.float64)
    kx = (r[None, :] * torch.cos(phis)[:, None]).reshape(-1)
    ky = (r[None, :] * torch.sin(phis)[:, None]).reshape(-1)
    return kx, ky


def _dft_matrix(
    image_size: int, kx: torch.Tensor, ky: torch.Tensor, pixel_spacing: float
) -> torch.Tensor:
    """(n_pts, N²) matrix E with E[m, x] = exp(−i k_m·(x−c))."""
    N = image_size
    x = (torch.arange(N, dtype=torch.float64) - N // 2) * pixel_spacing
    X, Y = torch.meshgrid(x, x, indexing="xy")
    phase = torch.outer(kx, X.reshape(-1)) + torch.outer(ky, Y.reshape(-1))
    return torch.exp(-1j * phase)


def torch_nufft_type2(
    image: torch.Tensor,
    n_spokes: int,
    samples_per_spoke: int,
    spoke_angles,
    pixel_spacing: float = 1.0,
) -> torch.Tensor:
    """Exact forward NUDFT. image (N, N) complex → k-space (n_sp, n_ro)."""
    N = image.shape[-1]
    kx, ky = torch_radial_kcoords(
        n_spokes, samples_per_spoke, spoke_angles, pixel_spacing
    )
    E = _dft_matrix(N, kx, ky, pixel_spacing)
    out = E @ image.to(torch.complex128).reshape(-1)
    return out.reshape(n_spokes, samples_per_spoke)


def torch_nufft_type1(
    kdata: torch.Tensor,
    image_size: int,
    spoke_angles,
    pixel_spacing: float = 1.0,
) -> torch.Tensor:
    """Exact adjoint NUDFT (conjugate transpose of type-2).
    k-space (n_sp, n_ro) complex → image (N, N)."""
    n_sp, n_ro = kdata.shape
    kx, ky = torch_radial_kcoords(n_sp, n_ro, spoke_angles, pixel_spacing)
    E = _dft_matrix(image_size, kx, ky, pixel_spacing)
    out = E.conj().transpose(0, 1) @ kdata.to(torch.complex128).reshape(-1)
    return out.reshape(image_size, image_size)
