"""PD-UNet / LPD model tests: shapes, gradient flow, scan/remat unroll,
weight-sharing modes, and tiny-batch overfit (SURVEY.md §4.2 tier 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.geometry import ParallelGeometry
from pdunet_tpu.models.primal_dual import make_lpd, make_pdunet, UnrolledPrimalDual, ConvNet
from pdunet_tpu.ops.radon.parallel import make_parallel_ops
from pdunet_tpu.training.loop import train

GEOM = ParallelGeometry(image_size=32, n_angles=10, det_count=32)
OPS = make_parallel_ops(GEOM)


def _data(key):
    img = jax.random.normal(key, (2, 32, 32))
    g = OPS.A(img)
    f0 = OPS.fbp(g)
    return img, g, f0


def test_pdunet_forward_and_grad():
    model = make_pdunet(OPS.A, OPS.At, n_iters=2, base_features=4, depth=1)
    img, g, f0 = _data(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), g, f0)["params"]
    out = model.apply({"params": params}, g, f0)
    assert out.shape == img.shape

    def loss(p):
        return jnp.mean((model.apply({"params": p}, g, f0) - img) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_per_iteration_params_are_stacked():
    model = make_pdunet(OPS.A, OPS.At, n_iters=3, base_features=4, depth=1)
    _, g, f0 = _data(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), g, f0)["params"]
    # nn.scan with variable_axes={'params': 0} stacks a leading unroll axis
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.shape[0] == 3


def test_shared_weights_mode():
    model = UnrolledPrimalDual(
        A=OPS.A, At=OPS.At,
        make_dual=lambda: ConvNet(1, 8),
        make_primal=lambda: ConvNet(1, 8),
        n_iters=3, share_weights=True,
    )
    _, g, f0 = _data(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), g, f0)["params"]
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.shape[0] != 3 or leaf.ndim < 2  # no unroll axis


def test_lpd_forward():
    model = make_lpd(OPS.A, OPS.At, n_iters=3, features=8)
    img, g, f0 = _data(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), g, f0)["params"]
    out = model.apply({"params": params}, g, f0)
    assert out.shape == img.shape


@pytest.mark.parametrize("kind", ["pdunet", "lpd"])
def test_overfit_tiny(kind):
    config = get_preset("pdunet_parallel")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=40, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, kind=kind, base_features=8, depth=1, n_iters=2,
            lpd_features=8,
        ),
        train=dataclasses.replace(
            config.train, batch_size=2, learning_rate=2e-3, warmup_steps=10,
            steps=120, log_every=10, n_ellipses=3,
        ),
    )
    result = train(config, fixed_data=True, verbose=False)
    first = result.history[0]["loss"]
    last = result.history[-1]["loss"]
    assert last < 0.7 * first, f"{kind}: loss {first:.4f} → {last:.4f}"
    assert result.final_eval["psnr"] > 14.0
