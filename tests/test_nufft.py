"""NUFFT validation (SURVEY.md §4.2 tier 1: direct DFT oracle on tiny grids;
tier 2: adjoint dot-product; plus Gaussian closed-form k-space and DC-adjoint
reconstruction quality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.geometry import RadialGeometry
from pdunet_tpu.ops.nufft import (
    build_nufft_plan,
    make_radial_ops,
    nufft_adjoint,
    nufft_forward,
)

GEOM = RadialGeometry(image_size=32, n_spokes=48, samples_per_spoke=64)


def rel_l2(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def direct_dft(geom: RadialGeometry, image: np.ndarray) -> np.ndarray:
    """O(N²·M) type-2 DFT oracle."""
    N = geom.image_size
    k_max = np.pi / geom.pixel_spacing
    n_ro = geom.samples_per_spoke
    r = (np.arange(n_ro) - n_ro / 2.0) * (2 * k_max / n_ro)
    phis = np.asarray(geom.spoke_angles)
    kx = (r[None, :] * np.cos(phis)[:, None]).ravel()
    ky = (r[None, :] * np.sin(phis)[:, None]).ravel()
    x = (np.arange(N) - N // 2) * geom.pixel_spacing
    X, Y = np.meshgrid(x, x)
    E = np.exp(-1j * (np.outer(kx, X.ravel()) + np.outer(ky, Y.ravel())))
    return (E @ image.ravel()).reshape(geom.n_spokes, n_ro)


@pytest.fixture(scope="module")
def plan():
    return build_nufft_plan(GEOM)


@pytest.fixture(scope="module")
def image(rng=None):
    rng = np.random.default_rng(7)
    # smooth complex image (band-limited): blurred noise
    img = rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img.real, 2.0) + 1j * gaussian_filter(img.imag, 2.0)
    return img.astype(np.complex64)


def test_forward_matches_direct_dft(plan, image):
    ours = nufft_forward(plan, jnp.asarray(image))
    oracle = direct_dft(GEOM, image)
    # ~5e-4 in complex64: KB J=4/σ=2 aliasing floor at the |k|=π band edge
    assert rel_l2(ours, oracle) < 1e-3


def test_adjoint_dot_product(plan):
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32)),
        jnp.complex64,
    )
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_spokes, GEOM.samples_per_spoke))
        + 1j * rng.standard_normal((GEOM.n_spokes, GEOM.samples_per_spoke)),
        jnp.complex64,
    )
    lhs = jnp.vdot(nufft_forward(plan, x), y)  # ⟨Ax, y⟩ with conj on first arg
    rhs = jnp.vdot(x, nufft_adjoint(plan, y))
    assert abs(lhs - rhs) / abs(lhs) < 1e-4


@pytest.mark.parametrize(
    "dtype,tol", [(jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)], ids=["f32", "bf16"]
)
def test_radial_ops_adjoint_per_dtype(dtype, tol):
    """The production radial bundle (fourier-slice fast path) keeps the
    complex adjoint identity per compute dtype (SURVEY.md §4.2.2)."""
    ops = make_radial_ops(GEOM, dtype=dtype)
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32)),
        jnp.complex64,
    )
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_spokes, GEOM.samples_per_spoke))
        + 1j * rng.standard_normal((GEOM.n_spokes, GEOM.samples_per_spoke)),
        jnp.complex64,
    )
    lhs = jnp.vdot(ops.A(x), y)
    rhs = jnp.vdot(x, ops.At(y))
    assert abs(lhs - rhs) / abs(lhs) < tol


def test_gaussian_closed_form(plan):
    """Gaussian image has closed-form k-space: F(k) = 2πs²·exp(−s²|k|²/2)."""
    N, s = 32, 3.0
    x = np.arange(N) - N // 2
    X, Y = np.meshgrid(x, x)
    img = np.exp(-(X**2 + Y**2) / (2 * s**2)).astype(np.complex64)
    ours = np.asarray(nufft_forward(plan, jnp.asarray(img)))
    k_max = np.pi
    n_ro = GEOM.samples_per_spoke
    r = (np.arange(n_ro) - n_ro / 2.0) * (2 * k_max / n_ro)
    F = 2 * np.pi * s**2 * np.exp(-(s**2) * r**2 / 2.0)
    F = np.broadcast_to(F[None, :], ours.shape)
    assert rel_l2(ours, F) < 1e-3


def test_dc_adjoint_recon(plan):
    """Density-compensated adjoint reconstructs a Gaussian to a few percent."""
    ops = make_radial_ops(GEOM)
    N, s = 32, 4.0
    x = np.arange(N) - N // 2
    X, Y = np.meshgrid(x, x)
    img = np.exp(-(X**2 + Y**2) / (2 * s**2)).astype(np.complex64)
    recon = np.asarray(ops.fbp(ops.A(jnp.asarray(img))))
    # ramp-DCF gridding floor: low-level streak background off the support
    assert rel_l2(recon, img) < 0.08
    assert abs(np.abs(recon).max() - 1.0) < 0.03


def test_voronoi_dcf_weights_and_recon_gain():
    """The DCF's per-spoke Δφ must be the Voronoi width in orientation
    space: exactly π/n for uniform spokes, summing to π always, and on
    golden-angle spokes (gaps spanning ~2×) it must beat the uniform-Δφ
    approximation on dense-data DCF-adjoint recon."""
    import math

    from pdunet_tpu.ops.nufft.nufft import radial_dcf, spoke_voronoi_dphi

    # uniform orientations → uniform cells
    uni = spoke_voronoi_dphi(np.linspace(0, np.pi, 48, endpoint=False))
    np.testing.assert_allclose(uni, np.pi / 48, rtol=1e-12)
    # golden-angle: sums to π, non-uniform
    ga = spoke_voronoi_dphi(GEOM.spoke_angles)
    assert abs(ga.sum() - np.pi) < 1e-9
    assert ga.max() / ga.min() > 1.5

    ops = make_radial_ops(GEOM)
    rng = np.random.default_rng(3)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.standard_normal((32, 32)), 1.5).astype(np.complex64)
    g = ops.A(jnp.asarray(img))
    dcf = radial_dcf(GEOM)
    recon_vor = np.asarray(
        ops.At(g * jnp.asarray(dcf)) / (2.0 * math.pi) ** 2
    )
    # uniform-Δφ variant of the same area-element DCF
    dcf_uni = dcf * (np.pi / GEOM.n_spokes) / ga[:, None]
    recon_uni = np.asarray(
        ops.At(g * jnp.asarray(dcf_uni.astype(np.float32))) / (2.0 * math.pi) ** 2
    )
    assert rel_l2(recon_vor, img) < rel_l2(recon_uni, img)


def test_numpy_nufft_twins_match_jax():
    """The host-side NumPy NUFFT pair (used by the Pipe-Menon DCF solver)
    must match the jax gridding path to float tolerance."""
    from pdunet_tpu.ops.nufft.nufft import (
        _np_nufft_adjoint,
        _np_nufft_forward,
        _plan_tables,
    )

    T = _plan_tables(GEOM)
    rng = np.random.default_rng(11)
    f = rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))
    k = rng.standard_normal((48, 64)) + 1j * rng.standard_normal((48, 64))
    plan = build_nufft_plan(GEOM)
    jf = np.asarray(nufft_forward(plan, jnp.asarray(f, jnp.complex64)))
    ja = np.asarray(nufft_adjoint(plan, jnp.asarray(k, jnp.complex64)))
    assert rel_l2(_np_nufft_forward(T, f), jf) < 1e-5
    assert rel_l2(_np_nufft_adjoint(T, k), ja) < 1e-5


def test_pipe_menon_dcf_beats_voronoi_and_is_calibrated():
    """2-iteration Pipe-Menon DCF (the shipped default): dense-data
    DCF-adjoint recon must beat the Voronoi-ramp seed at FIXED scale (no
    per-image refitting — the unit-gain calibration must carry the
    absolute normalization), and reconstruct a smooth image near unit
    gain. Measured at the shipped 512-spoke 256² geometry: 46.13 dB/0.904
    → 49.33 dB/0.984 (see radial_dcf_pipe_menon docstring)."""
    from scipy.ndimage import gaussian_filter

    from pdunet_tpu.ops.nufft import radial_dcf_pipe_menon
    from pdunet_tpu.ops.nufft.nufft import radial_dcf

    pm = radial_dcf_pipe_menon(GEOM)
    assert pm.shape == (GEOM.n_spokes, GEOM.samples_per_spoke)
    assert np.all(np.isfinite(pm)) and np.all(pm >= 0)

    ops = make_radial_ops(GEOM)  # default dcf: pipe_menon → ops.fbp uses pm
    np.testing.assert_allclose(np.asarray(ops.dcf), pm, rtol=1e-6)
    rng = np.random.default_rng(7)
    img = gaussian_filter(rng.standard_normal((32, 32)), 1.5).astype(np.complex64)
    g = ops.A(jnp.asarray(img))
    recon_pm = np.asarray(ops.fbp(g))
    recon_vor = np.asarray(
        ops.At(g * jnp.asarray(radial_dcf(GEOM))) / (2.0 * np.pi) ** 2
    )
    assert rel_l2(recon_pm, img) < rel_l2(recon_vor, img)

    # unit gain on a smooth Gaussian (the calibration family, but a
    # different width than the calibration blob itself)
    x = np.arange(32) - 16
    X, Y = np.meshgrid(x, x)
    blob = np.exp(-(X**2 + Y**2) / (2 * 3.0**2)).astype(np.complex64)
    recon = np.asarray(ops.fbp(ops.A(jnp.asarray(blob))))
    assert abs(np.abs(recon).max() - 1.0) < 0.05


def test_complex_custom_vjp(plan):
    ops = make_radial_ops(GEOM)
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32)),
        jnp.complex64,
    )
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_spokes, GEOM.samples_per_spoke))
        + 1j * rng.standard_normal((GEOM.n_spokes, GEOM.samples_per_spoke)),
        jnp.complex64,
    )

    # d/df Re⟨A f, y⟩ → holomorphic-style grad should equal At(y) (conjugated
    # by JAX's convention: grad of real loss wrt complex input is conj-grad)
    def loss(f):
        return jnp.real(jnp.vdot(y, ops.A(f)))

    g = jax.grad(loss)(x)
    expected = jnp.conj(ops.At(y))
    assert rel_l2(g, expected) < 1e-4


def test_batched(plan):
    rng = np.random.default_rng(9)
    x = jnp.asarray(
        rng.standard_normal((3, 32, 32)) + 1j * rng.standard_normal((3, 32, 32)),
        jnp.complex64,
    )
    k = nufft_forward(plan, x)
    assert k.shape == (3, GEOM.n_spokes, GEOM.samples_per_spoke)
    back = nufft_adjoint(plan, k)
    assert back.shape == x.shape


def test_odd_samples_per_spoke_falls_back_to_gridding():
    """make_radial_ops degrades to the gridding oracle (with a warning) for
    odd readout lengths instead of raising from build_fs_plan (the spectral
    path needs an even grid)."""
    geom = RadialGeometry(image_size=16, n_spokes=12, samples_per_spoke=33)
    with pytest.warns(UserWarning, match="even samples_per_spoke"):
        ops = make_radial_ops(geom)  # default impl='fourier_slice'
    rng = np.random.default_rng(3)
    img = jnp.asarray(
        (rng.standard_normal((16, 16))
         + 1j * rng.standard_normal((16, 16))).astype(np.complex64))
    k = ops.A(img)
    assert k.shape == (12, 33)
    # oracle parity: the fallback IS the gridding impl
    k_ref = make_radial_ops(geom, impl="gridding").A(img)
    assert rel_l2(k, k_ref) < 1e-6


def test_spectral_plan_refused_by_angle_sharded_fbp():
    """The fourier_slice backing ParallelPlan carries a synthetic geometry
    ([Re|Im] spectral halves as the 'detector' axis); detector-space fbp
    consumers must refuse it rather than compute a nonsense bp_scale."""
    from jax.sharding import Mesh

    from pdunet_tpu.ops.nufft.fourier_slice import build_fs_plan
    from pdunet_tpu.parallel.angle_shard import angle_sharded_fbp

    fs_plan = build_fs_plan(GEOM)
    assert fs_plan.par_plan.meta["spectral_selection"] is True
    mesh = Mesh(np.array(jax.devices()[:1]), ("angle",))
    sino = jnp.zeros((1,) + tuple(fs_plan.par_plan.meta["S"] for _ in [0]))
    with pytest.raises(ValueError, match="spectral"):
        angle_sharded_fbp(fs_plan.par_plan, sino, mesh)
