"""Fan-beam projector validation.

Ground truth: a fan ray IS a parallel ray — p_fan(β, u) equals the
closed-form parallel ellipse projection at (θ = β + γ(u), s = R·sinγ(u)),
with no interpolation involved, so the analytic comparison is exact up to
the projector's own discretization.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.geometry import FanGeometry
from pdunet_tpu.data.phantoms import rasterize_ellipses
from pdunet_tpu.ops.radon.fan import build_fan_plan, fan_backproject, fan_project, make_fan_ops


GEOM = FanGeometry(image_size=64, n_angles=96)


def analytic_fan_sinogram(ellipses, geom: FanGeometry) -> np.ndarray:
    R, D = geom.source_distance, geom.det_distance
    betas = np.asarray(geom.angles)
    u = (np.arange(geom.det_count) - (geom.det_count - 1) / 2.0) * geom.det_spacing
    gamma = np.arctan2(u, R + D)
    TH = betas[:, None] + gamma[None, :]
    SS = R * np.sin(gamma)[None, :]
    sino = np.zeros(TH.shape)
    for rho, a, b, x0, y0, phi in ellipses:
        th = TH - phi
        alpha2 = (a * np.cos(th)) ** 2 + (b * np.sin(th)) ** 2
        t = SS - x0 * np.cos(TH) - y0 * np.sin(TH)
        under = alpha2 - t**2
        sino += np.where(under > 0, 2 * rho * a * b * np.sqrt(np.maximum(under, 0)) / alpha2, 0.0)
    return sino.astype(np.float32)


def rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.fixture(scope="module")
def plan():
    return build_fan_plan(GEOM)


def test_fan_matches_analytic(plan):
    ell = np.array([[1.0, 20.0, 14.0, 3.0, -2.0, 0.3]])
    img = rasterize_ellipses(ell, GEOM.image_size)
    gt = analytic_fan_sinogram(ell, GEOM)
    sino = fan_project(plan, jnp.asarray(img))
    assert rel_l2(sino, gt) < 0.03


@pytest.mark.parametrize(
    "dtype,tol", [(jnp.float32, 5e-5), (jnp.bfloat16, 2e-2)], ids=["f32", "bf16"]
)
def test_fan_adjoint_dot_product(dtype, tol, rng):
    plan = build_fan_plan(GEOM, dtype=dtype)
    x = jnp.asarray(rng.standard_normal((GEOM.image_size,) * 2), jnp.float32)
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_angles, GEOM.det_count)), jnp.float32
    )
    lhs = jnp.vdot(fan_project(plan, x), y)
    rhs = jnp.vdot(x, fan_backproject(plan, y))
    assert abs(lhs - rhs) / abs(lhs) < tol


def test_fan_fbp_roundtrip():
    geom = FanGeometry(image_size=128, n_angles=256)
    ops = make_fan_ops(geom)
    img = rasterize_ellipses(np.array([[1.0, 40.0, 40.0, 0.0, 0.0, 0.0]]), 128)
    recon = np.asarray(ops.fbp(ops.A(jnp.asarray(img))))
    N = 128
    yy, xx = np.mgrid[:N, :N]
    r2 = (xx - (N - 1) / 2) ** 2 + (yy - (N - 1) / 2) ** 2
    assert abs(recon[r2 < 25**2].mean() - 1.0) < 0.02
    assert abs(recon[(r2 > 50**2) & (r2 < 60**2)].mean()) < 0.02


def test_fan_custom_vjp(plan, rng):
    ops = make_fan_ops(GEOM)
    x = jnp.asarray(rng.standard_normal((GEOM.image_size,) * 2), jnp.float32)
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_angles, GEOM.det_count)), jnp.float32
    )
    g1 = jax.grad(lambda f: jnp.vdot(ops.A(f), y))(x)
    assert rel_l2(g1, ops.At(y)) < 5e-5


def test_limited_angle_fan():
    """Limited-angle geometry builds and projects; unmeasured region is
    simply absent (fewer angles), FBP still runs."""
    n = 96
    angles = tuple(1.5 * math.pi * k / n for k in range(n))  # 270° coverage
    geom = FanGeometry(image_size=64, angles=angles)
    ops = make_fan_ops(geom)
    img = rasterize_ellipses(np.array([[1.0, 20.0, 20.0, 0.0, 0.0, 0.0]]), 64)
    sino = ops.A(jnp.asarray(img))
    assert sino.shape == (n, geom.det_count)
    recon = ops.fbp(sino)
    assert np.isfinite(np.asarray(recon)).all()
