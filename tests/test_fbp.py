"""FBP round-trip and filter tests (SURVEY.md §4.2 tier 3: FBP∘Radon ≈ id)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.geometry import ParallelGeometry
from pdunet_tpu.data.phantoms import rasterize_ellipses, shepp_logan_ellipses
from pdunet_tpu.ops.metrics import psnr, ssim
from pdunet_tpu.ops.radon.filtering import FILTERS, filter_sinogram
from pdunet_tpu.ops.radon.parallel import make_parallel_ops


@pytest.fixture(scope="module")
def setup():
    geom = ParallelGeometry(image_size=128, n_angles=180, det_count=128)
    ops = make_parallel_ops(geom)
    ell = shepp_logan_ellipses(radius=0.45 * geom.image_size)
    img = jnp.asarray(rasterize_ellipses(ell, geom.image_size))
    return geom, ops, img


def test_fbp_roundtrip_quality(setup):
    geom, ops, img = setup
    recon = ops.fbp(ops.A(img))
    # Compare inside the reconstruction circle (corners are outside the
    # detector's field of view — standard CT convention). The projector's
    # quadratic-B-spline footprint acts as a mild low-pass, so 23+ dB vs the
    # razor-sharp raster is the expected full-view FBP quality at 128².
    N = geom.image_size
    yy, xx = np.mgrid[:N, :N]
    mask = (xx - (N - 1) / 2) ** 2 + (yy - (N - 1) / 2) ** 2 < (0.48 * N) ** 2
    diff = (np.asarray(recon) - np.asarray(img))[mask]
    data_range = float(np.ptp(np.asarray(img)[mask]))
    p = 20 * np.log10(data_range) - 10 * np.log10(np.mean(diff**2))
    assert p > 23.0, f"round-trip PSNR {p:.2f} dB too low"


def test_fbp_dc_level():
    """FBP must reproduce absolute gray levels (scale calibration).

    A uniform disk's deep interior pins the DC gain: plateau must be 1.0 to
    a fraction of a percent, and the exterior must stay at zero.
    """
    geom = ParallelGeometry(image_size=128, n_angles=180, det_count=128)
    ops = make_parallel_ops(geom)
    img = rasterize_ellipses(np.array([[1.0, 40.0, 40.0, 0.0, 0.0, 0.0]]), 128)
    recon = np.asarray(ops.fbp(ops.A(jnp.asarray(img))))
    N = geom.image_size
    yy, xx = np.mgrid[:N, :N]
    r2 = (xx - (N - 1) / 2) ** 2 + (yy - (N - 1) / 2) ** 2
    assert abs(recon[r2 < 25**2].mean() - 1.0) < 0.005
    assert abs(recon[(r2 > 50**2) & (r2 < 60**2)].mean()) < 0.005


def test_all_filters_run(setup):
    geom, ops, img = setup
    sino = ops.A(img)
    for name in FILTERS:
        out = filter_sinogram(sino, geom.det_spacing, name)
        assert out.shape == sino.shape
        assert np.isfinite(np.asarray(out)).all()


def test_filter_is_self_adjoint(setup, rng):
    geom, ops, _ = setup
    shape = (geom.n_angles, geom.det_count)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    lhs = jnp.vdot(filter_sinogram(x, geom.det_spacing), y)
    rhs = jnp.vdot(x, filter_sinogram(y, geom.det_spacing))
    assert abs(lhs - rhs) / abs(lhs) < 1e-4


def test_metrics_sanity(setup, rng):
    _, _, img = setup
    noisy = img + 0.05 * jnp.asarray(
        rng.standard_normal(img.shape), jnp.float32
    )
    assert float(psnr(img, img)) > 80
    assert float(ssim(img, img)) > 0.999
    assert float(psnr(noisy, img)) < float(psnr(img, img))
    assert 0.0 < float(ssim(noisy, img)) < 1.0
    # SSIM must stay in [-1, 1] even for wildly out-of-range predictions,
    # where the E[x^2]-mu^2 f32 cancellation error exceeds the C2
    # stabilizer (seen as SSIM=1.17 on unconverged radial evals)
    wild = 1e3 * jnp.asarray(rng.standard_normal(img.shape), jnp.float32)
    s = float(ssim(wild, img))
    assert -1.0 <= s <= 1.0, s
    assert s < 0.5  # and it should score badly, not near-perfect
