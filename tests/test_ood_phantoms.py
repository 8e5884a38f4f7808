"""OOD phantom families (data/phantoms.py) — the eval-side distribution.

These generators feed scripts/ood_eval.py (VERDICT r3 missing #2): trained
checkpoints are scored on families the random-ellipse training distribution
cannot produce. The properties asserted here are the ones that make that
evaluation meaningful: right shape/dtype, deterministic under a seeded rng,
actually non-degenerate (non-constant, inside the scan support), and the
nonneg flag (complex/MRI magnitude convention) really is non-negative.
"""

import numpy as np
import pytest

from pdunet_tpu.data.phantoms import (
    OOD_KINDS,
    ood_phantom,
    rasterize_rectangles,
    textured_phantom,
)

N = 64


@pytest.mark.parametrize("kind", OOD_KINDS)
def test_shape_dtype_finite_nonconstant(kind):
    img = ood_phantom(kind, np.random.default_rng(0), N)
    assert img.shape == (N, N) and img.dtype == np.float32
    assert np.isfinite(img).all()
    assert img.std() > 1e-3, f"{kind} produced a (near-)constant image"


@pytest.mark.parametrize("kind", OOD_KINDS)
def test_deterministic_under_seed(kind):
    a = ood_phantom(kind, np.random.default_rng(7), N)
    b = ood_phantom(kind, np.random.default_rng(7), N)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("kind", OOD_KINDS)
def test_nonneg_flag(kind):
    img = ood_phantom(kind, np.random.default_rng(3), N, nonneg=True)
    assert img.min() >= -1e-6, f"{kind} nonneg draw went negative"


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown OOD kind"):
        ood_phantom("spirals", np.random.default_rng(0), N)


def test_rectangle_has_a_sharp_corner():
    # an axis-aligned unit rectangle: the rasterization must hold a flat
    # plateau with an abrupt drop at the edge (no ellipse sum does this)
    rect = np.array([[1.0, 10.0, 6.0, 0.0, 0.0, 0.0]])
    img = rasterize_rectangles(rect, N)
    c = N // 2
    assert img[c, c] == pytest.approx(1.0)
    # plateau: interior row is constant at rho
    interior = img[c, c - 5 : c + 5]
    np.testing.assert_allclose(interior, 1.0, atol=1e-6)
    # edge: full transition happens within ~2 px (anti-aliased step)
    row = img[c]
    outside = row[: c - 14]
    np.testing.assert_allclose(outside, 0.0, atol=1e-6)


def test_texture_lives_inside_the_support():
    rng = np.random.default_rng(5)
    img = textured_phantom(rng, N, texture_amp=0.5)
    base = np.abs(img) > 0
    # outside-of-support pixels carry no texture (exact zeros there)
    assert (~base).sum() > 0
    # inside the support the image is not piecewise-constant: the gradient
    # within the largest ellipse interior is non-trivial
    gy, gx = np.gradient(img)
    interior_grad = np.hypot(gx, gy)[base]
    assert interior_grad.std() > 1e-3


def test_hu_volume_store_air_background_and_window(tmp_path):
    """scripts/ood_eval.py's HU store must read back with the training
    background convention: air (-1000 HU) outside the body support -> 0
    after SliceDataset's HU->mu conversion, tissue around water (1.0).
    Regression for two round-4 bugs: a water background (constant 1.0 the
    models never trained on) and an infer --hu-window (center,width)
    mix-up that scored a [-275,-25] window below all content."""
    from pdunet_tpu.data.datasets import SliceDataset
    from pdunet_tpu.data.pipeline import mu_to_hu, normalize_ct_window, MU_WATER
    from scripts.ood_eval import write_hu_volume

    path = tmp_path / "hu.h5"
    write_hu_volume(path, 3, N)
    ds = SliceDataset(str(path), split="test")
    s = ds.batch(range(3))
    # corners are air: exactly 0 in relative attenuation (training bg)
    assert np.allclose(s[:, :4, :4], 0.0) and np.allclose(s[:, -4:, -4:], 0.0)
    # body content sits around water, within the soft-tissue HU budget
    body = s[np.abs(s) > 1e-6]
    assert body.size > 0 and 0.7 - 1e-5 <= body.min() and body.max() <= 1.3 + 1e-5
    # the soft-tissue window ood_eval passes (CENTER 40, WIDTH 400) must
    # actually see the content: windowed target is neither all-0 nor all-1
    win = np.asarray(normalize_ct_window(mu_to_hu(s * MU_WATER), 40.0, 400.0))
    assert 0.05 < win.mean() < 0.95 and win.std() > 1e-2
