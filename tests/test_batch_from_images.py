"""Task.batch_from_images: the file-backed evaluation path (C11) builds a
valid batch from given slices for every task kind, radial/complex included."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.training.tasks import build_task


def tiny(preset, **geo):
    config = get_preset(preset)
    geo = {"image_size": 32, "n_angles": 40, "sparsity": 4, **geo}
    return dataclasses.replace(
        config,
        geometry=dataclasses.replace(config.geometry, **geo),
        model=dataclasses.replace(
            config.model, base_features=8, depth=1, n_iters=2
        ),
        train=dataclasses.replace(config.train, batch_size=2),
    )


@pytest.mark.parametrize(
    "preset,geo",
    [
        ("fbp_unet_parallel", {}),
        ("sino_unet_parallel", {}),
        ("pdunet_parallel", {}),
        ("pdunet_fan", {"n_angles": 48}),
        ("pdunet_radial", {"n_angles": 48, "samples_per_spoke": 64}),
    ],
)
def test_recon_from_given_images(preset, geo, rng):
    task = build_task(tiny(preset, **geo))
    images = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    if preset == "pdunet_radial":
        images = images.astype(jnp.complex64)
    batch = task.batch_from_images(images)
    params = task.init_params(jax.random.PRNGKey(0))
    recon = task.recon_fn(params, batch)
    assert recon.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(recon)).all()
    loss, _ = task.loss_fn(params, batch)
    assert np.isfinite(float(loss))
