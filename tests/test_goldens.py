"""Golden-metric regression tests (SURVEY.md §4.2 tier 7).

The paper's PSNR/SSIM tables are unreachable offline (BASELINE.json
"published": {}), so frozen-seed mini-training runs are the regression
anchor: any change to operators, models, data synthesis, or the optimizer
that shifts final quality beyond tolerance trips these. Goldens are pinned
in goldens.json; regenerate with
``python -m tests.test_goldens`` after *intentional* behavior changes.
"""

import dataclasses
import json
import pathlib

import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.training.loop import train

pytestmark = pytest.mark.slow  # minutes-long mini-training; fast lane: -m 'not slow'

GOLDEN_PATH = pathlib.Path(__file__).with_name("goldens.json")
TOL_DB = 0.6          # float nondeterminism headroom across XLA versions
TOL_SSIM = 0.02

PRESETS = [
    "fbp_unet_parallel",
    "sino_unet_parallel",
    "pdunet_parallel",
    "pdunet_fan",
    "pdunet_radial",
    "sino_unet_radial",
    "lpd_parallel",
]


def golden_config(preset):
    config = get_preset(preset)
    geom_kw = {"image_size": 32, "n_angles": 40, "sparsity": 4}
    if config.geometry.kind == "radial":
        geom_kw["samples_per_spoke"] = 48
    return dataclasses.replace(
        config,
        geometry=dataclasses.replace(config.geometry, **geom_kw),
        model=dataclasses.replace(
            config.model, base_features=8, depth=2 if preset.startswith("fbp") else 1,
            n_iters=2,
        ),
        train=dataclasses.replace(
            config.train, batch_size=2, learning_rate=2e-3, warmup_steps=10,
            steps=100, log_every=50, eval_every=1000, seed=0, n_ellipses=4,
        ),
    )


def run_golden(preset):
    result = train(golden_config(preset), verbose=False)
    return {
        "psnr": round(result.final_eval["psnr"], 3),
        "ssim": round(result.final_eval["ssim"], 4),
    }


@pytest.mark.parametrize("preset", PRESETS)
def test_matches_golden(preset):
    goldens = json.loads(GOLDEN_PATH.read_text())
    got = run_golden(preset)
    want = goldens[preset]
    assert abs(got["psnr"] - want["psnr"]) < TOL_DB, f"{preset}: {got} vs {want}"
    assert abs(got["ssim"] - want["ssim"]) < TOL_SSIM, f"{preset}: {got} vs {want}"


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-pinned
    out = {p: run_golden(p) for p in PRESETS}
    GOLDEN_PATH.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {GOLDEN_PATH}: {out}")
