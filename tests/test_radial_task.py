"""Radial-MRI PD-UNet task (BASELINE config 5): complex plumbing end-to-end."""

import dataclasses

from pdunet_tpu.configs import get_preset
from pdunet_tpu.training.loop import train


def test_radial_pdunet_overfits():
    config = get_preset("pdunet_radial")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=48, samples_per_spoke=64,
            sparsity=4,
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=1, n_iters=2
        ),
        train=dataclasses.replace(
            config.train, batch_size=2, learning_rate=2e-3, warmup_steps=10,
            steps=100, log_every=10, n_ellipses=3,
        ),
    )
    result = train(config, fixed_data=True, verbose=False)
    first = result.history[0]["loss"]
    last = result.history[-1]["loss"]
    assert last < 0.7 * first, f"loss {first:.4f} → {last:.4f}"
    assert result.final_eval["psnr"] > 12.0
