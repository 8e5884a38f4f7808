"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4.2 tier 6): the sharded step runs, and matches the unsharded
step bit-for-tolerance with the same seed."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from pdunet_tpu.configs import get_preset
from pdunet_tpu.parallel import make_mesh, make_sharded_train_step, replicate
from pdunet_tpu.training.loop import make_train_step
from pdunet_tpu.training.tasks import build_task


@pytest.fixture(scope="module")
def task():
    # f32 model: the equality test checks *sharding semantics* (psum vs
    # single-device batch sum), which matches to ~1e-9 in f32. In bf16 the
    # comparison is meaningless: the UNSHARDED gradient itself carries up
    # to ~20% batch-contraction rounding error vs f32 truth (measured:
    # unsharded-bf16 grad_norm 0.1908 vs sharded-bf16 0.2297 vs f32 truth
    # 0.2305 — sharding actually *reduces* the rounding by splitting the
    # accumulation).
    config = get_preset("fbp_unet_parallel")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=40, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=2, use_bfloat16=False
        ),
        train=dataclasses.replace(config.train, batch_size=8),
    )
    return build_task(config)


def _fresh_state(task, tx=None):
    params = task.init_params(jax.random.PRNGKey(1))
    return train_state.TrainState.create(
        apply_fn=None, params=params, tx=tx or optax.adam(1e-3)
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_runs_and_matches_single(task):
    # SGD keeps the update linear in the gradient, so this directly tests
    # sharded-psum == unsharded gradient equality. (Adam divides by
    # sqrt(v)+eps: on a near-zero gradient element, float reassociation
    # noise between the two reductions is amplified to a full ±lr update —
    # a flaky false positive, not a sharding bug.)
    mesh = make_mesh()
    key = jax.random.PRNGKey(42)
    sgd = optax.sgd(1e-2)

    state_1 = _fresh_state(task, tx=sgd)
    step_1 = make_train_step(task, donate=False)
    state_1_next, metrics_1 = step_1(state_1, key)

    state_8 = replicate(_fresh_state(task, tx=sgd), mesh)
    step_8 = make_sharded_train_step(task, mesh, donate=False)
    state_8_next, metrics_8 = step_8(state_8, key)

    # same seed → same synthesized batch → same loss and same updated params
    np.testing.assert_allclose(
        float(metrics_1["loss"]), float(metrics_8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_1["grad_norm"]), float(metrics_8["grad_norm"]), rtol=1e-4
    )
    l1 = jax.tree_util.tree_leaves(state_1_next.params)
    l8 = jax.tree_util.tree_leaves(state_8_next.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_multi_step_training(task):
    mesh = make_mesh()
    state = replicate(_fresh_state(task), mesh)
    step = make_sharded_train_step(task, mesh)
    losses = []
    for i in range(5):
        state, metrics = step(state, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()


@pytest.fixture(scope="module")
def pdunet_task():
    # The flagship unroll: custom_vjp physics ops inside nn.scan under the
    # data-axis psum — the composition that could actually break sharding
    # semantics (plain convs alone can't exercise it).
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
    return build_task(config)


def test_pdunet_sharded_step_matches_single(pdunet_task):
    """1-vs-8-device equality for the PD-UNet unroll (SURVEY.md §4.2 tier 6:
    the custom_vjp operator gradients must psum identically to the
    single-device batch contraction)."""
    mesh = make_mesh()
    key = jax.random.PRNGKey(7)
    sgd = optax.sgd(1e-2)

    state_1 = _fresh_state(pdunet_task, tx=sgd)
    step_1 = make_train_step(pdunet_task, donate=False)
    state_1_next, metrics_1 = step_1(state_1, key)

    state_8 = replicate(_fresh_state(pdunet_task, tx=sgd), mesh)
    step_8 = make_sharded_train_step(pdunet_task, mesh, donate=False)
    state_8_next, metrics_8 = step_8(state_8, key)

    np.testing.assert_allclose(
        float(metrics_1["loss"]), float(metrics_8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_1["grad_norm"]), float(metrics_8["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_1_next.params),
        jax.tree_util.tree_leaves(state_8_next.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_from_images_matches_single(task):
    """File-backed multi-chip: host-loaded images enter the sharded jit and
    the in-jit measurement synthesis + gradient psum must match the
    single-device step on the same images."""
    mesh = make_mesh()
    key = jax.random.PRNGKey(3)
    sgd = optax.sgd(1e-2)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((8, 32, 32)), jnp.float32)

    state_1 = _fresh_state(task, tx=sgd)
    step_1 = make_train_step(task, donate=False, from_images=True)
    state_1_next, metrics_1 = step_1(state_1, key, images)

    state_8 = replicate(_fresh_state(task, tx=sgd), mesh)
    step_8 = make_sharded_train_step(
        task, mesh, donate=False, from_images=True
    )
    state_8_next, metrics_8 = step_8(state_8, key, images)

    np.testing.assert_allclose(
        float(metrics_1["loss"]), float(metrics_8["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_1_next.params),
        jax.tree_util.tree_leaves(state_8_next.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_infer_devices_matches_single(tmp_path):
    """`infer.py --devices 8` (data-parallel eval surface) produces the same
    metric table as the single-device run: random-but-deterministic params
    (no --ckpt-dir), same synthetic test set, params replicated and the
    batch sharded over the data axis."""
    import json

    import infer

    common = [
        "--preset", "fbp_unet_parallel",
        "--set", "geometry.image_size=32",
        "--set", "geometry.n_angles=40",
        "--set", "model.base_features=8",
        "--set", "model.depth=2",
        "--set", "model.use_bfloat16=false",
        "--batch", "8", "--n-slices", "8",
    ]
    out1 = tmp_path / "single.json"
    out8 = tmp_path / "mesh.json"
    infer.main(common + ["--json-out", str(out1)])
    infer.main(common + ["--json-out", str(out8), "--devices", "8"])
    t1 = json.loads(out1.read_text())
    t8 = json.loads(out8.read_text())
    assert t1["n_slices"] == t8["n_slices"] == 8
    np.testing.assert_allclose(t8["psnr_mean"], t1["psnr_mean"], rtol=1e-5)
    np.testing.assert_allclose(t8["ssim_mean"], t1["ssim_mean"], rtol=1e-4)
