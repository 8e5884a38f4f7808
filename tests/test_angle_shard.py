"""Angle-axis sharding (SURVEY.md §5.7): sharded forward/adjoint equal the
single-device ops on the 8-virtual-device CPU mesh; adjoint psum included."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pdunet_tpu.geometry import ParallelGeometry, build_parallel_plan
from pdunet_tpu.ops.radon.parallel import parallel_backproject, parallel_project
from pdunet_tpu.parallel.angle_shard import (
    angle_sharded_backproject,
    angle_sharded_project,
)

# limited-angle scan in [-45°, 45°] → all angles x-primary (single group),
# 40 angles = 5 per device on the 8-device mesh
ANGLES = tuple(-math.pi / 4 + math.pi / 2 * k / 40 for k in range(40))
GEOM = ParallelGeometry(image_size=32, angles=ANGLES, det_count=32)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("angle",))


@pytest.fixture(scope="module")
def plan():
    return build_parallel_plan(GEOM)


def test_sharded_forward_matches(plan, mesh, rng):
    f = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    ref = parallel_project(plan, f)
    out = angle_sharded_project(plan, f, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_adjoint_matches(plan, mesh, rng):
    p = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    ref = parallel_backproject(plan, p)
    out = angle_sharded_backproject(plan, p, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


# standard full [0,π) scan — two angle groups (x- and y-primary) with sizes
# not divisible by 8, exercising the per-group padding + reassembly
FULL_GEOM = ParallelGeometry(image_size=32, n_angles=40, det_count=32)


@pytest.fixture(scope="module")
def full_plan():
    return build_parallel_plan(FULL_GEOM)


def test_full_scan_uses_pair_sharding(full_plan):
    """The full-scan fixtures must exercise the mirror-pair sharded path
    (pairs shard as units so the stage-1 sharing survives sharding)."""
    assert full_plan.meta["use_pairs"]
    assert full_plan.meta["P_x"] + full_plan.meta["P_y"] < 40


def test_sharded_forward_full_scan(full_plan, mesh, rng):
    f = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    ref = parallel_project(full_plan, f)
    out = angle_sharded_project(full_plan, f, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_adjoint_full_scan(full_plan, mesh, rng):
    p = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    ref = parallel_backproject(full_plan, p)
    out = angle_sharded_backproject(full_plan, p, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_fbp_full_scan(full_plan, mesh):
    """Full sharded FBP at a shipped geometry on the 8-device mesh."""
    from pdunet_tpu.data.phantoms import rasterize_ellipses, shepp_logan_ellipses
    from pdunet_tpu.ops.metrics import psnr
    from pdunet_tpu.ops.radon.parallel import make_parallel_ops
    from pdunet_tpu.parallel.angle_shard import angle_sharded_fbp

    ops = make_parallel_ops(FULL_GEOM)
    img = jnp.asarray(
        rasterize_ellipses(shepp_logan_ellipses(0.45 * 32), 32)
    )[None]
    sino = ops.A(img)
    ref = ops.fbp(sino)
    out = angle_sharded_fbp(full_plan, sino, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert float(psnr(out, img)[0]) > 15.0  # sane recon, not just self-consistent


# --- 2-D data x angle mesh composition (SURVEY.md §2d: batch is the
# primary scale axis, angle the beyond-HBM axis; they must compose) ---


@pytest.fixture(scope="module")
def mesh2d():
    from pdunet_tpu.parallel import make_mesh

    return make_mesh(8, axes=("data", "angle"), shape=(4, 2))


def test_2d_mesh_forward_matches(full_plan, mesh2d, rng):
    f = jnp.asarray(rng.standard_normal((4, 32, 32)), jnp.float32)
    ref = parallel_project(full_plan, f)
    out = angle_sharded_project(full_plan, f, mesh2d, batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_2d_mesh_adjoint_matches(full_plan, mesh2d, rng):
    p = jnp.asarray(rng.standard_normal((4, 40, 32)), jnp.float32)
    ref = parallel_backproject(full_plan, p)
    out = angle_sharded_backproject(full_plan, p, mesh2d, batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_2d_mesh_fbp_batch_sharded(full_plan, mesh2d, rng):
    """FBP on the (4 data x 2 angle) mesh: batch stays sharded across the
    data axis while the angle psum reduces only over the angle axis."""
    from pdunet_tpu.ops.radon.parallel import make_parallel_ops
    from pdunet_tpu.parallel.angle_shard import angle_sharded_fbp

    ops = make_parallel_ops(FULL_GEOM)
    f = jnp.asarray(rng.standard_normal((4, 32, 32)), jnp.float32)
    sino = ops.A(f)
    ref = ops.fbp(sino)
    out = angle_sharded_fbp(full_plan, sino, mesh2d, batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_make_mesh_shape_validation():
    from pdunet_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="mesh shape"):
        make_mesh(8, axes=("data", "angle"), shape=(4, 4))


# --- Product path: angle-sharded operator bundles inside a real train
# step (SURVEY.md §5.7 beyond-HBM recipe; train.py --angle-devices) ---


def test_angle_sharded_ops_bundle_matches(full_plan, mesh2d, rng):
    """make_parallel_ops(mesh=...) is a drop-in bundle: A/At/fbp match the
    unsharded bundle, and the custom_vjp pairing holds through jax.grad."""
    from pdunet_tpu.ops.radon.parallel import make_parallel_ops

    ops = make_parallel_ops(FULL_GEOM)
    ops_sh = make_parallel_ops(FULL_GEOM, mesh=mesh2d, batch_axis="data")
    f = jnp.asarray(rng.standard_normal((4, 32, 32)), jnp.float32)
    sino = ops.A(f)
    np.testing.assert_allclose(
        np.asarray(ops_sh.A(f)), np.asarray(sino), atol=1e-4)
    # adjoint output is ~50 in magnitude (40-angle accumulation): the
    # pair-sharded stage-1 sums in a different order, rel ~2e-6
    np.testing.assert_allclose(
        np.asarray(ops_sh.At(sino)), np.asarray(ops.At(sino)), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ops_sh.fbp(sino)), np.asarray(ops.fbp(sino)), atol=1e-4)
    # gradient through the sharded A == unsharded (custom_vjp → At)
    g = jax.grad(lambda x: jnp.sum(ops_sh.A(x) ** 2))(f)
    g_ref = jax.grad(lambda x: jnp.sum(ops.A(x) ** 2))(f)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)


@pytest.mark.slow  # minutes-scale on the 1-core box
def test_pdunet_trains_on_data_angle_mesh(mesh2d):
    """The flagship PD-UNet train step on the (4 data x 2 angle) mesh equals
    the single-device step: angle-sharded custom_vjp ops inside the unroll,
    psum over angle inside the op adjoints, psum over data for gradients."""
    import dataclasses

    import optax
    from flax.training import train_state

    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.parallel import make_sharded_train_step, replicate
    from pdunet_tpu.training.loop import make_train_step
    from pdunet_tpu.training.tasks import build_task

    config = get_preset("pdunet_parallel")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=40, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=1, n_iters=2,
            use_bfloat16=False,
        ),
        train=dataclasses.replace(config.train, batch_size=8),
    )
    task_1 = build_task(config)
    task_sh = build_task(config, mesh=mesh2d, batch_axis="data")

    key = jax.random.PRNGKey(11)
    sgd = optax.sgd(1e-2)
    params = task_1.init_params(jax.random.PRNGKey(1))

    state_1 = train_state.TrainState.create(apply_fn=None, params=params, tx=sgd)
    state_1_next, metrics_1 = make_train_step(task_1, donate=False)(state_1, key)

    state_sh = replicate(
        train_state.TrainState.create(apply_fn=None, params=params, tx=sgd),
        mesh2d,
    )
    step_sh = make_sharded_train_step(task_sh, mesh2d, donate=False)
    state_sh_next, metrics_sh = step_sh(state_sh, key)

    np.testing.assert_allclose(
        float(metrics_1["loss"]), float(metrics_sh["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_1_next.params),
        jax.tree_util.tree_leaves(state_sh_next.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow  # minutes-scale on the 1-core box
def test_fan_angle_sharded_bundle_matches(mesh2d, rng):
    """Fan ops on the 2-D mesh: the extended-grid backing projector shards
    over the angle axis; A/At/fbp and gradients equal the unsharded bundle
    (the rebin gathers stay global)."""
    from pdunet_tpu.geometry import FanGeometry
    from pdunet_tpu.ops.radon.fan import make_fan_ops

    geom = FanGeometry(
        image_size=32, n_angles=40, det_count=48, source_distance=64.0,
        det_distance=32.0,
        angles=tuple(1.5 * math.pi * k / 40 for k in range(40)),
    )
    ops = make_fan_ops(geom)
    ops_sh = make_fan_ops(geom, mesh=mesh2d, batch_axis="data")
    f = jnp.asarray(rng.standard_normal((4, 32, 32)), jnp.float32)
    sino = ops.A(f)
    np.testing.assert_allclose(
        np.asarray(ops_sh.A(f)), np.asarray(sino), atol=1e-4)
    # adjoint output is ~50 in magnitude (40-angle accumulation): the
    # pair-sharded stage-1 sums in a different order, rel ~2e-6
    np.testing.assert_allclose(
        np.asarray(ops_sh.At(sino)), np.asarray(ops.At(sino)), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ops_sh.fbp(sino)), np.asarray(ops.fbp(sino)), atol=1e-4)
    g = jax.grad(lambda x: jnp.sum(ops_sh.A(x) ** 2))(f)
    g_ref = jax.grad(lambda x: jnp.sum(ops.A(x) ** 2))(f)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)
    # odd batch exercises the zero-pad path (batch 3 on a 4-wide data axis)
    f3 = f[:3]
    np.testing.assert_allclose(
        np.asarray(ops_sh.A(f3)), np.asarray(ops.A(f3)), atol=1e-4)


def test_radial_angle_sharded_bundle_matches(mesh2d, rng):
    """Radial NUFFT fast path on the 2-D mesh: spokes shard through the
    projection-slice parallel projector; complex A/At/DCF-adjoint match."""
    from pdunet_tpu.geometry import RadialGeometry
    from pdunet_tpu.ops.nufft import make_radial_ops

    geom = RadialGeometry(image_size=32, n_spokes=48, samples_per_spoke=48)
    ops = make_radial_ops(geom)
    ops_sh = make_radial_ops(geom, mesh=mesh2d, batch_axis="data")
    z = jnp.asarray(
        rng.standard_normal((4, 32, 32)) + 1j * rng.standard_normal((4, 32, 32)),
        jnp.complex64,
    )
    k = ops.A(z)
    np.testing.assert_allclose(
        np.asarray(ops_sh.A(z)), np.asarray(k), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ops_sh.At(k)), np.asarray(ops.At(k)), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(ops_sh.fbp(k)), np.asarray(ops.fbp(k)), atol=1e-4)


def test_radial_gridding_mesh_rejected():
    from pdunet_tpu.geometry import RadialGeometry
    from pdunet_tpu.ops.nufft import make_radial_ops
    from pdunet_tpu.parallel import make_mesh

    mesh = make_mesh(8, axes=("angle",))
    geom = RadialGeometry(image_size=32, n_spokes=48, samples_per_spoke=48)
    with pytest.raises(NotImplementedError, match="fourier_slice"):
        make_radial_ops(geom, impl="gridding", mesh=mesh)
