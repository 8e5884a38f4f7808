"""Projection-slice NUFFT fast path vs the direct DFT and the gridding
oracle (SURVEY.md §4.2 tiers 1-4: the two implementations are each other's
cross-check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.geometry import RadialGeometry
from pdunet_tpu.ops.nufft import make_radial_ops
from pdunet_tpu.ops.nufft.fourier_slice import (
    build_fs_plan,
    fs_nufft_adjoint,
    fs_nufft_forward,
)
from tests.test_nufft import GEOM, direct_dft, rel_l2


@pytest.fixture(scope="module")
def plan():
    return build_fs_plan(GEOM)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    from scipy.ndimage import gaussian_filter

    img = rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))
    img = gaussian_filter(img.real, 2.0) + 1j * gaussian_filter(img.imag, 2.0)
    return img.astype(np.complex64)


def test_matches_direct_dft(plan, image):
    # the spectral path is exact to float rounding (no footprint, no
    # deapodization, no grid aliasing) — measured ~4e-7 on this fixture
    ours = fs_nufft_forward(plan, jnp.asarray(image))
    oracle = direct_dft(GEOM, image)
    assert rel_l2(ours, oracle) < 1e-5


def test_matches_gridding_impl(plan, image):
    fs = fs_nufft_forward(plan, jnp.asarray(image))
    grid_ops = make_radial_ops(GEOM, impl="gridding")
    gr = grid_ops.A(jnp.asarray(image))
    # bound set by the gridding oracle's own KB aliasing floor, not by fs
    assert rel_l2(fs, gr) < 2e-3


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
    lhs = jnp.vdot(fs_nufft_forward(plan, x), y)
    rhs = jnp.vdot(x, fs_nufft_adjoint(plan, y))
    assert abs(lhs - rhs) / abs(lhs) < 1e-4


def test_dc_adjoint_recon_fs():
    ops = make_radial_ops(GEOM)  # default = fourier_slice
    N, s = 32, 4.0
    x = np.arange(N) - N // 2
    X, Y = np.meshgrid(x, x)
    img = np.exp(-(X**2 + Y**2) / (2 * s**2)).astype(np.complex64)
    recon = np.asarray(ops.fbp(ops.A(jnp.asarray(img))))
    assert rel_l2(recon, img) < 0.08
    assert abs(np.abs(recon).max() - 1.0) < 0.03


def test_complex_vjp_matches_plain_autodiff(plan):
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
    ops = make_radial_ops(GEOM)
    g_custom = jax.grad(lambda f: jnp.real(jnp.vdot(y, ops.A(f))))(x)
    g_plain = jax.grad(
        lambda f: jnp.real(jnp.vdot(y, fs_nufft_forward(plan, f)))
    )(x)
    assert rel_l2(g_custom, g_plain) < 1e-4
