"""Training smoke tests (SURVEY.md §4.2 tier 5): each task overfits a tiny
fixed batch in a few dozen steps on CPU."""

import dataclasses

import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.configs.base import GeometryConfig, ModelConfig, TrainConfig
from pdunet_tpu.training.loop import train


def tiny(config, **model_kw):
    return dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=40, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=2, **model_kw
        ),
        train=dataclasses.replace(
            config.train,
            batch_size=2,
            learning_rate=3e-3,
            warmup_steps=10,
            steps=150,
            log_every=10,
            n_ellipses=3,
        ),
    )


# sino_unet's loss includes the image term through FBP, which floors higher
# on a 32² toy problem — hence the looser drop requirement.
@pytest.mark.parametrize(
    "preset,drop", [("fbp_unet_parallel", 0.5), ("sino_unet_parallel", 0.7)]
)
def test_overfit_tiny_batch(preset, drop):
    config = tiny(get_preset(preset))
    result = train(config, fixed_data=True, verbose=False)
    first = result.history[0]["loss"]
    last = result.history[-1]["loss"]
    assert last < drop * first, f"{preset}: loss {first:.4f} → {last:.4f} did not drop"
    assert result.final_eval["psnr"] > 10.0


def test_checkpoint_resume(tmp_path):
    config = tiny(get_preset("fbp_unet_parallel"))
    config = dataclasses.replace(
        config,
        train=dataclasses.replace(
            config.train, ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=20, steps=40,
            log_every=20,
        ),
    )
    r1 = train(config, fixed_data=True, verbose=False)
    # Second call resumes from step 40 and trains to 60
    config2 = dataclasses.replace(
        config, train=dataclasses.replace(config.train, steps=60)
    )
    r2 = train(config2, fixed_data=True, verbose=False)
    assert int(r2.state.step) == 60
    assert r2.history[-1]["loss"] <= r1.history[-1]["loss"] * 1.5
