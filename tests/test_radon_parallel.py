"""Parallel-beam projector validation (SURVEY.md §4.2 tiers 1-3).

Tier 1: analytic ellipse sinograms (closed form) vs both implementations.
Tier 2: dot-product adjoint test ⟨Ax, y⟩ = ⟨x, A†y⟩.
Tier 3: production factored path vs ray-driven oracle; adjoint vs
        jax.linear_transpose of the forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.geometry import ParallelGeometry, build_parallel_plan
from pdunet_tpu.data.phantoms import (
    analytic_parallel_sinogram,
    random_ellipses,
    rasterize_ellipses,
    shepp_logan_ellipses,
)
from pdunet_tpu.ops.radon.parallel import (
    make_parallel_ops,
    parallel_backproject,
    parallel_project,
    parallel_project_ref,
)


GEOM = ParallelGeometry(image_size=64, n_angles=60, det_count=64)


def rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.fixture(scope="module")
def plan():
    return build_parallel_plan(GEOM)


@pytest.fixture(scope="module")
def phantom():
    ell = shepp_logan_ellipses(radius=0.45 * GEOM.image_size)
    img = rasterize_ellipses(ell, GEOM.image_size)
    sino = analytic_parallel_sinogram(
        ell, np.asarray(GEOM.angles), GEOM.det_count, GEOM.det_spacing
    )
    return img, sino


def test_factored_matches_analytic(plan, phantom):
    # Shepp-Logan at 64² has sub-pixel ellipses; rasterization error dominates,
    # so the bound is loose here and tight in test_smooth_ellipse_analytic.
    img, sino_gt = phantom
    sino = parallel_project(plan, jnp.asarray(img))
    assert rel_l2(sino, sino_gt) < 0.1


def test_ray_oracle_matches_analytic(phantom):
    img, sino_gt = phantom
    sino = parallel_project_ref(GEOM, jnp.asarray(img))
    assert rel_l2(sino, sino_gt) < 0.1


def test_smooth_ellipse_analytic(plan):
    ell = np.array([[1.0, 20.0, 14.0, 3.0, -2.0, 0.3]])
    img = rasterize_ellipses(ell, GEOM.image_size)
    gt = analytic_parallel_sinogram(
        ell, np.asarray(GEOM.angles), GEOM.det_count, GEOM.det_spacing
    )
    assert rel_l2(parallel_project(plan, jnp.asarray(img)), gt) < 0.025
    assert rel_l2(parallel_project_ref(GEOM, jnp.asarray(img)), gt) < 0.025


def test_factored_matches_ray_oracle(plan, phantom):
    img, _ = phantom
    a = parallel_project(plan, jnp.asarray(img))
    b = parallel_project_ref(GEOM, jnp.asarray(img))
    assert rel_l2(a, b) < 0.03


# per-dtype coverage (SURVEY.md §4.2.2 "per geometry, per dtype"): the bf16
# operand path shares weights between A and A†, so the adjoint identity
# holds to bf16 rounding (~2^-8) rather than f32 precision
_DTYPE_TOL = [(jnp.float32, 5e-5), (jnp.bfloat16, 2e-2)]


@pytest.mark.parametrize("dtype,tol", _DTYPE_TOL, ids=["f32", "bf16"])
def test_adjoint_dot_product(dtype, tol, rng):
    plan = build_parallel_plan(GEOM, dtype=dtype)
    x = jnp.asarray(rng.standard_normal((GEOM.image_size,) * 2), jnp.float32)
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_angles, GEOM.det_count)), jnp.float32
    )
    ax = parallel_project(plan, x)
    aty = parallel_backproject(plan, y)
    lhs = jnp.vdot(ax, y)
    rhs = jnp.vdot(x, aty)
    assert abs(lhs - rhs) / abs(lhs) < tol


@pytest.mark.parametrize("dtype,tol", _DTYPE_TOL, ids=["f32", "bf16"])
def test_adjoint_equals_linear_transpose(dtype, tol, rng):
    """Production adjoint == exact transpose of the production forward."""
    plan = build_parallel_plan(GEOM, dtype=dtype)
    x_shape = jax.ShapeDtypeStruct((GEOM.image_size,) * 2, jnp.float32)
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_angles, GEOM.det_count)), jnp.float32
    )
    (transposed,) = jax.linear_transpose(lambda f: parallel_project(plan, f), x_shape)(y)
    ours = parallel_backproject(plan, y)
    assert rel_l2(ours, transposed) < tol


def test_custom_vjp_pairing(rng):
    ops = make_parallel_ops(GEOM)
    x = jnp.asarray(rng.standard_normal((GEOM.image_size,) * 2), jnp.float32)
    y = jnp.asarray(
        rng.standard_normal((GEOM.n_angles, GEOM.det_count)), jnp.float32
    )
    # grad of <A(f), y> wrt f is At(y); grad of <At(p), x> wrt p is A(x)
    g1 = jax.grad(lambda f: jnp.vdot(ops.A(f), y))(x)
    assert rel_l2(g1, ops.At(y)) < 5e-5
    g2 = jax.grad(lambda p: jnp.vdot(ops.At(p), x))(y)
    assert rel_l2(g2, ops.A(x)) < 5e-5


def test_batched_shapes(plan, rng):
    x = jnp.asarray(rng.standard_normal((3, 2, GEOM.image_size, GEOM.image_size)), jnp.float32)
    p = parallel_project(plan, x)
    assert p.shape == (3, 2, GEOM.n_angles, GEOM.det_count)
    bp = parallel_backproject(plan, p)
    assert bp.shape == x.shape


def test_random_phantom_accuracy(plan, rng):
    ell = random_ellipses(rng, 6, radius=0.45 * GEOM.image_size, min_axis_frac=0.15)
    img = rasterize_ellipses(ell, GEOM.image_size)
    gt = analytic_parallel_sinogram(
        ell, np.asarray(GEOM.angles), GEOM.det_count, GEOM.det_spacing
    )
    sino = parallel_project(plan, jnp.asarray(img))
    assert rel_l2(sino, gt) < 0.05


def test_wrap_safe_extension_corner_mass():
    """The tightened spectral-grid extension (geometry.py: wrap-safety bound
    + MXU lane-tile K snap) must not let circularly wrapped mass or its
    band-limit ringing contaminate the detector window. Worst case: mass in
    the image corners (maximum overhang past a det_count == image_size
    window) — the factored projector must still match the ray-driven oracle,
    and the deviation from an ultra-conservative grid must stay at the
    ringing floor."""
    import pdunet_tpu.geometry as G

    geom = ParallelGeometry(image_size=128, n_angles=48, det_count=128)
    N = geom.image_size
    img = np.zeros((N, N), np.float32)
    for sl in ((slice(0, 8), slice(0, 8)), (slice(-8, None), slice(-8, None)),
               (slice(0, 8), slice(-8, None)), (slice(-8, None), slice(0, 8))):
        img[sl] = 1.0

    plan = build_parallel_plan(geom)
    # the tight bound must actually engage at this geometry
    assert plan.meta["M"] < int(np.ceil(N / 2 * 0.7072)) + 2

    p_new = parallel_project(plan, jnp.asarray(img))
    p_ref = parallel_project_ref(geom, jnp.asarray(img), oversample=4)
    assert rel_l2(p_new, p_ref) < 0.04  # discretization-family floor

    old_guard, old_min = G.RING_GUARD, G.MIN_RING_GUARD
    try:
        G.RING_GUARD = G.MIN_RING_GUARD = 10_000  # forces the old wide grid
        plan_wide = build_parallel_plan(geom)
    finally:
        G.RING_GUARD, G.MIN_RING_GUARD = old_guard, old_min
    assert plan_wide.meta["K"] > plan.meta["K"]
    p_wide = parallel_project(plan_wide, jnp.asarray(img))
    # wrapped-ringing contamination floor (measured ~4e-3 on this corner
    # worst case; realistic inscribed phantoms sit at ~3e-5)
    assert rel_l2(p_new, p_wide) < 0.02
