"""Cross-implementation parity vs an independent torch-CPU stack
(SURVEY.md §4.2 tier 3; BASELINE.json:2 — the judge metric's "PSNR/SSIM vs
reference PyTorch" leg).

The oracle (tests/oracles/) shares no code with pdunet_tpu: rays go through
``torch.nn.functional.grid_sample``, filtering through ``torch.fft``, and
the network twin re-evaluates the flax parameter tree with torch NCHW
primitives. Tolerances: operator comparisons are between different
discretization families (DFT-factored vs grid-sample ray/pixel driven), so
they use the same few-percent rel-L2 budget as the in-repo ray oracle
(tests/test_radon_parallel.py); matched-weights network comparisons are
float-tight.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pdunet_tpu.data.phantoms import rasterize_ellipses, shepp_logan_ellipses
from pdunet_tpu.geometry import ParallelGeometry
from pdunet_tpu.ops.radon.parallel import make_parallel_ops
from tests.oracles.torch_ct import (
    torch_parallel_fbp,
    torch_parallel_project,
)

N = 64
GEOM = ParallelGeometry(image_size=N, n_angles=90, det_count=N)


def rel_l2(a, b):
    # keep complex inputs complex: casting to float64 would silently drop
    # the imaginary part and the radial legs would compare only Re(·)
    dt = np.complex128 if (np.iscomplexobj(a) or np.iscomplexobj(b)) else np.float64
    a = np.asarray(a).astype(dt)
    b = np.asarray(b).astype(dt)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


@pytest.fixture(scope="module")
def phantom():
    return np.asarray(
        rasterize_ellipses(shepp_logan_ellipses(0.45 * N), N), np.float32
    )


@pytest.fixture(scope="module")
def ops():
    return make_parallel_ops(GEOM)


def test_forward_projector_parity(phantom, ops):
    """jax factored projector vs torch grid_sample ray sampler: same
    line-integral operator, independent discretizations."""
    sino_jax = np.asarray(ops.A(jnp.asarray(phantom)[None]))[0]
    sino_torch = torch_parallel_project(
        torch.from_numpy(phantom), GEOM.angles, GEOM.det_count,
        GEOM.det_spacing, GEOM.pixel_spacing, oversample=4,
    ).numpy()
    assert rel_l2(sino_jax, sino_torch) < 0.03


def test_adjoint_parity_via_torch_autograd(phantom, ops):
    """The jax At must match the true adjoint of the *torch* projector,
    obtained mechanically by torch autograd — an independent check that our
    custom_vjp pairing implements the transpose of the same operator."""
    # a smooth sinogram-domain weight: the two projectors agree as
    # *operators on band-limited signals* (different quadratures of the same
    # line integral); white noise probes exactly the sub-pixel quadrature
    # differences and would compare discretization artifacts, not adjoints
    w = np.asarray(
        torch_parallel_project(
            torch.from_numpy(phantom), GEOM.angles, GEOM.det_count,
            GEOM.det_spacing, GEOM.pixel_spacing, oversample=4,
        ).numpy(),
        np.float32,
    )
    x = torch.from_numpy(phantom).clone().requires_grad_(True)
    y = torch_parallel_project(
        x, GEOM.angles, GEOM.det_count, GEOM.det_spacing, GEOM.pixel_spacing,
        oversample=4,
    )
    (y * torch.from_numpy(w)).sum().backward()
    at_torch = x.grad.numpy()
    at_jax = np.asarray(ops.At(jnp.asarray(w)[None]))[0]
    # adjoints of slightly different discretizations of the same operator:
    # compare on the interior disk (the ray sampler's corner handling
    # differs) with the operator-level tolerance
    yy, xx = np.mgrid[0:N, 0:N]
    disk = (yy - (N - 1) / 2) ** 2 + (xx - (N - 1) / 2) ** 2 <= (0.45 * N) ** 2
    assert rel_l2(at_jax[disk], at_torch[disk]) < 0.05


def test_fbp_parity(phantom, ops):
    """Full ramp-FBP chains agree: the torch chain is pixel-driven
    grid_sample backprojection of a torch.fft Ram-Lak filtering."""
    sino = np.asarray(ops.A(jnp.asarray(phantom)[None]))[0]
    recon_jax = np.asarray(ops.fbp(jnp.asarray(sino)[None]))[0]
    recon_torch = torch_parallel_fbp(
        torch.from_numpy(sino), GEOM.angles, N, GEOM.det_spacing,
        GEOM.pixel_spacing,
    ).numpy()
    yy, xx = np.mgrid[0:N, 0:N]
    disk = (yy - (N - 1) / 2) ** 2 + (xx - (N - 1) / 2) ** 2 <= (0.48 * N) ** 2
    assert rel_l2(recon_jax[disk], recon_torch[disk]) < 0.05
    # and both are sane reconstructions of the phantom
    mse_jax = float(np.mean((recon_jax[disk] - phantom[disk]) ** 2))
    mse_torch = float(np.mean((recon_torch[disk] - phantom[disk]) ** 2))
    assert mse_jax < 0.01 and mse_torch < 0.01


def test_unet_forward_parity():
    """Matched-weights flax-vs-torch UNet forward: float-tight equality —
    the strongest cross-stack check of network semantics (conv layout,
    transposed-conv convention, pooling, skip wiring, stem shuffle)."""
    from pdunet_tpu.models.unet import UNet
    from tests.oracles.torch_model import torch_unet_apply

    for stem, depth in ((1, 2), (2, 2)):
        model = UNet(out_channels=2, base_features=8, depth=depth, stem=stem)
        x = np.asarray(
            np.random.default_rng(1).standard_normal((2, 24, 40, 3)),
            np.float32,
        )
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        out_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        params_np = jax.tree_util.tree_map(np.asarray, params)
        out_torch = (
            torch_unet_apply(
                params_np,
                torch.from_numpy(x).permute(0, 3, 1, 2),
                depth=depth,
                stem=stem,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(
            out_torch, out_jax, atol=2e-4,
            err_msg=f"stem={stem} depth={depth}",
        )


def test_pdunet_full_model_parity(phantom):
    """End-to-end PD-UNet forward: flax unroll + jax factored ops vs torch
    unroll + torch grid_sample ops, matched weights. Differences come only
    from the operators' discretizations, so the operator-level budget
    applies to the final reconstruction."""
    from pdunet_tpu.models.primal_dual import make_pdunet
    from tests.oracles.torch_ct import torch_parallel_project
    from tests.oracles.torch_model import torch_pdunet_apply

    geom = ParallelGeometry(image_size=32, n_angles=40, det_count=32)
    ops = make_parallel_ops(geom)
    sigma = 20.0  # fixed spectral-ish normalization, same for both stacks
    A_j = lambda f: ops.A(f) / sigma
    At_j = lambda p: ops.At(p) / sigma
    model = make_pdunet(A=A_j, At=At_j, n_iters=2, base_features=8, depth=1,
                        stem=1)

    img = np.asarray(
        rasterize_ellipses(shepp_logan_ellipses(0.45 * 32), 32), np.float32
    )[None]
    g = np.asarray(A_j(jnp.asarray(img)))
    f0 = np.asarray(ops.fbp(jnp.asarray(g) * sigma))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(g), jnp.asarray(f0)
    )["params"]
    out_jax = np.asarray(
        model.apply({"params": params}, jnp.asarray(g), jnp.asarray(f0))
    )

    A_t = lambda f: torch_parallel_project(
        f, geom.angles, geom.det_count, oversample=4) / sigma
    # torch adjoint via autograd of the torch forward (exact transpose)
    def At_t(p):
        x = torch.zeros(32, 32, requires_grad=True)
        (A_t(x) * p).sum().backward()
        return x.grad

    params_np = jax.tree_util.tree_map(np.asarray, params)
    out_torch = torch_pdunet_apply(
        params_np, torch.from_numpy(g), torch.from_numpy(f0),
        A_t, At_t, n_iters=2, depth=1, stem=1,
    ).detach().numpy()
    assert rel_l2(out_torch, out_jax) < 0.05


# ---------------------------------------------------------------------------
# Radial MRI leg: jax KB-gridding NUFFT vs an exact torch NUDFT
# (tests/oracles/torch_mri.py). On this tiny grid the torch matmul is the
# literal type-2 definition, so the tolerance is the KB J=4/σ=2 gridding
# error floor (~5e-4), not a discretization-family budget.
# ---------------------------------------------------------------------------

from pdunet_tpu.geometry import RadialGeometry
from tests.oracles.torch_mri import torch_nufft_type1, torch_nufft_type2

GEOM_R = RadialGeometry(image_size=32, n_spokes=48, samples_per_spoke=64)


@pytest.fixture(scope="module")
def radial_image():
    rng = np.random.default_rng(7)
    N = GEOM_R.image_size
    x = (np.arange(N) - N // 2) / N
    X, Y = np.meshgrid(x, x)
    mag = np.exp(-(X**2 + Y**2) / (2 * 0.2**2))
    phase = 0.7 * X + 0.3 * Y**2 + 0.05 * rng.standard_normal((N, N))
    return (mag * np.exp(1j * phase)).astype(np.complex64)


@pytest.fixture(scope="module")
def radial_ops():
    from pdunet_tpu.ops.nufft import make_radial_ops

    return make_radial_ops(GEOM_R)


def _torch_A(img_t):
    return torch_nufft_type2(
        img_t, GEOM_R.n_spokes, GEOM_R.samples_per_spoke,
        GEOM_R.spoke_angles, GEOM_R.pixel_spacing,
    )


def test_radial_forward_parity(radial_image, radial_ops):
    """jax type-2 KB NUFFT vs the exact torch NUDFT."""
    ours = np.asarray(radial_ops.A(jnp.asarray(radial_image)))
    oracle = _torch_A(torch.from_numpy(radial_image)).numpy()
    assert rel_l2(ours, oracle) < 1e-3


def test_radial_adjoint_parity(radial_image, radial_ops):
    """jax type-1 gridding adjoint vs the exact torch conjugate transpose."""
    k = _torch_A(torch.from_numpy(radial_image))  # dense-ish test k-space
    ours = np.asarray(radial_ops.At(jnp.asarray(k.numpy().astype(np.complex64))))
    oracle = torch_nufft_type1(
        k, GEOM_R.image_size, GEOM_R.spoke_angles, GEOM_R.pixel_spacing
    ).numpy()
    assert rel_l2(ours, oracle) < 1e-3


def test_radial_adjoint_via_torch_autograd(radial_image, radial_ops):
    """The adjoint relation derived by torch autograd of the torch forward
    must agree with BOTH the torch type-1 and the jax At.

    For L = Re⟨A f, y⟩ with f = a + ib: dL/da = Re(A†y), dL/db = Im(A†y).
    """
    rng = np.random.default_rng(11)
    y_np = (
        rng.standard_normal((GEOM_R.n_spokes, GEOM_R.samples_per_spoke))
        + 1j * rng.standard_normal((GEOM_R.n_spokes, GEOM_R.samples_per_spoke))
    ).astype(np.complex128)
    y = torch.from_numpy(y_np)

    N = GEOM_R.image_size
    a = torch.zeros(N, N, dtype=torch.float64, requires_grad=True)
    b = torch.zeros(N, N, dtype=torch.float64, requires_grad=True)
    L = (_torch_A(a + 1j * b) * y.conj()).sum().real
    L.backward()
    adj_autograd = (a.grad + 1j * b.grad).numpy()

    adj_direct = torch_nufft_type1(
        y, N, GEOM_R.spoke_angles, GEOM_R.pixel_spacing
    ).numpy()
    assert rel_l2(adj_autograd, adj_direct) < 1e-10  # torch-internal: exact

    adj_jax = np.asarray(radial_ops.At(jnp.asarray(y_np.astype(np.complex64))))
    assert rel_l2(adj_jax, adj_direct) < 1e-3


# ---------------------------------------------------------------------------
# Fan-beam leg: jax rebinning-composition operator vs a torch ray-driven
# fan projector (tests/oracles/torch_ct.py::torch_fan_project).
# ---------------------------------------------------------------------------

from pdunet_tpu.geometry import FanGeometry
from pdunet_tpu.ops.radon.fan import make_fan_ops
from tests.oracles.torch_ct import torch_fan_project

GEOM_F = FanGeometry(image_size=64, n_angles=96)


def _torch_A_fan(img_t, oversample=2):
    return torch_fan_project(
        img_t, GEOM_F.angles, GEOM_F.det_count, GEOM_F.source_distance,
        GEOM_F.det_distance, GEOM_F.det_spacing, GEOM_F.pixel_spacing,
        oversample=oversample,
    )


def test_fan_forward_parity(phantom):
    """jax extended-grid rebinning projector vs torch ray sampler (different
    discretization families, same few-percent budget as the parallel leg)."""
    fan_ops = make_fan_ops(GEOM_F)
    ours = np.asarray(fan_ops.A(jnp.asarray(phantom)))
    oracle = _torch_A_fan(torch.from_numpy(phantom)).numpy()
    assert rel_l2(ours, oracle) < 0.03


def test_fan_adjoint_parity_via_torch_autograd(phantom):
    """Adjoint parity on a smooth sinogram weighting: autograd of the torch
    fan forward vs the jax fan backprojector (interior disk, where the
    families' boundary handling can't dominate)."""
    fan_ops = make_fan_ops(GEOM_F)
    A, S = GEOM_F.n_angles, GEOM_F.det_count
    bb, ss = np.meshgrid(
        np.linspace(0, 2 * math.pi, A), np.linspace(-1, 1, S), indexing="ij"
    )
    w = (np.exp(-(ss**2) / 0.32) * (1.2 + np.cos(2 * bb))).astype(np.float32)

    x_t = torch.zeros(GEOM_F.image_size, GEOM_F.image_size, requires_grad=True)
    (_torch_A_fan(x_t) * torch.from_numpy(w)).sum().backward()
    adj_torch = x_t.grad.numpy()

    adj_jax = np.asarray(fan_ops.At(jnp.asarray(w)))

    N = GEOM_F.image_size
    yy, xx = np.mgrid[:N, :N]
    c = (N - 1) / 2.0
    disk = ((xx - c) ** 2 + (yy - c) ** 2) < (0.4 * N) ** 2
    assert rel_l2(adj_jax[disk], adj_torch[disk]) < 0.05
