"""Mid-scale golden for the flagship (SURVEY.md §4.2 tier 7; VERDICT r3
weak #5: the 32²/100-step goldens' ±0.6 dB tolerance lets small real
regressions through — e.g. a subtle DCF or pairing bug worth ~0.3 dB).

One 64², 350-step pdunet_parallel run with a mid-size model and a ±0.2 dB
/ ±0.005 SSIM tolerance sits between "kernel allclose" and "±0.6 dB
end-to-end": long enough for quality drift to integrate, tight enough to
catch it, still CPU-feasible (~3-4 min on the 1-core CI box). Regenerate
after intentional behavior changes with
``python -m tests.test_goldens_midscale``.
"""

import dataclasses
import json

import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.training.loop import train
from tests.test_goldens import GOLDEN_PATH

pytestmark = pytest.mark.slow  # minutes-long mini-training; fast lane: -m 'not slow'

TOL_DB = 0.2
TOL_SSIM = 0.005
KEY = "pdunet_parallel_mid64"


def midscale_config():
    config = get_preset("pdunet_parallel")
    return dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=64, n_angles=96, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, base_features=16, depth=2, n_iters=2,
            use_bfloat16=False,  # CPU-pinned golden: bf16 emulation is slow
        ),
        train=dataclasses.replace(
            config.train, batch_size=2, learning_rate=2e-3, warmup_steps=20,
            steps=350, log_every=100, eval_every=1000, seed=0, n_ellipses=6,
            val_slices=8,
        ),
    )


def run_midscale():
    result = train(midscale_config(), verbose=False)
    return {
        "psnr": round(result.final_eval["psnr"], 3),
        "ssim": round(result.final_eval["ssim"], 4),
    }


def test_matches_midscale_golden():
    goldens = json.loads(GOLDEN_PATH.read_text())
    if KEY not in goldens:
        pytest.fail(f"{KEY} missing from goldens.json; regenerate with "
                    "python -m tests.test_goldens_midscale")
    got = run_midscale()
    want = goldens[KEY]
    assert abs(got["psnr"] - want["psnr"]) < TOL_DB, f"{got} vs {want}"
    assert abs(got["ssim"] - want["ssim"]) < TOL_SSIM, f"{got} vs {want}"


if __name__ == "__main__":
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    out = run_midscale()
    goldens = json.loads(GOLDEN_PATH.read_text())
    goldens[KEY] = out
    GOLDEN_PATH.write_text(json.dumps(goldens, indent=2) + "\n")
    print(f"wrote {KEY} to {GOLDEN_PATH}: {out} "
          f"({round(time.time() - t0, 1)}s)")
