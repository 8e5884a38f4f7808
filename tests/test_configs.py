"""Config system tests (SURVEY.md §5.6): presets, JSON round-trip, and the
shipped configs/*.json files staying in sync with the preset functions."""

import json
import pathlib

import pytest

from pdunet_tpu.configs import ExperimentConfig, PRESETS, get_preset

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / "configs"


def test_unknown_preset_raises():
    with pytest.raises(KeyError, match="unknown preset"):
        get_preset("resnet_cone_beam")


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_json_round_trip(name):
    config = get_preset(name)
    again = ExperimentConfig.from_json(config.to_json())
    assert again == config


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_shipped_json_matches_preset(name):
    """configs/<name>.json is the CLI-facing twin of the preset function;
    drift between them means --config and --preset silently train
    different models."""
    path = CONFIG_DIR / f"{name}.json"
    assert path.exists(), f"missing shipped config {path}"
    on_disk = ExperimentConfig.from_json(path.read_text())
    assert on_disk == get_preset(name)


def test_every_shipped_json_has_a_preset():
    names = {p.stem for p in CONFIG_DIR.glob("*.json")}
    assert names == set(PRESETS)


def test_override_dotted_set():
    config = get_preset("fbp_unet_parallel")
    out = config.override({"train.learning_rate": "3e-4",
                           "geometry.image_size": "128"})
    assert out.train.learning_rate == pytest.approx(3e-4)
    assert out.geometry.image_size == 128


def test_override_unknown_key_errors():
    config = get_preset("fbp_unet_parallel")
    with pytest.raises(Exception):
        config.override({"train.no_such_field": "1"})


def test_sino_unet_fan_combo_rejected():
    """sino_unet + fan geometry is physically invalid (the angular-upsampling
    wrap uses parallel-beam detector-flip symmetry) — build_task must refuse
    loudly instead of silently training a wrong model."""
    import dataclasses

    from pdunet_tpu.training.tasks import build_task

    config = get_preset("pdunet_fan")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(config.geometry, image_size=32,
                                     n_angles=40),
        model=dataclasses.replace(config.model, kind="sino_unet"),
    )
    with pytest.raises(ValueError, match="parallel-beam"):
        build_task(config)
