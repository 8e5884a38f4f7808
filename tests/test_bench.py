"""CPU regression tests for the benchmark harness (bench.py).

The driver runs ``python bench.py`` on the TPU at the end of every round
and records its one JSON line — a broken harness silently costs the
round's headline number, so the measurement path itself is under test.
Tiny geometry overrides keep this CPU-fast; the numbers are meaningless
here, only the plumbing (config overrides, jit-argument batch threading,
carry selection, row schema) is asserted.
"""

import json
import subprocess
import sys

import pytest


@pytest.mark.parametrize("preset,carry_checked", [
    ("pdunet_parallel", "f0"),
    ("fbp_unet_parallel", "fbp"),
])
def test_preset_recon_row_schema(preset, carry_checked):
    import bench

    row = bench.bench_preset_recon(preset, 2, image_size=32, n_angles=48)
    assert row["preset"] == preset
    assert row["batch"] == 2
    assert row["recon_slices_per_sec"] > 0
    assert row["sec_per_slice"] > 0
    # geometry overrides must be reflected (and the scale-scan extras set)
    assert row["image_size"] == 32 and row["n_angles"] == 48
    assert row["mpixels_per_sec"] >= 0


def test_timeit_measures_and_threads_aux():
    import jax.numpy as jnp

    import bench

    aux = (jnp.full((4, 4), 2.0),)
    dt = bench.timeit(lambda x, a: x * a, jnp.ones((4, 4)), iters=10, aux=aux)
    assert dt > 0

    # fn that *requires* the aux argument fails loudly if aux is dropped
    with pytest.raises(TypeError):
        bench.timeit(lambda x, a: x * a, jnp.ones((4, 4)), iters=10)


def test_cli_emits_one_json_line():
    # the driver contract: stdout line 1 parses as the headline metric
    out = subprocess.run(
        [sys.executable, "bench.py", "--platform", "cpu", "--batch", "2",
         "--image-size", "32", "--n-iters", "2"],
        capture_output=True, text=True, timeout=600, check=True,
    )
    line = out.stdout.strip().splitlines()[0]
    d = json.loads(line)
    assert d["metric"] == "pdunet_256_sparse_ct_recon_throughput"
    assert d["value"] > 0 and d["unit"] == "slices/sec/chip"
    # both fields are independently rounded (value to 2 dp, ratio to 3 dp)
    assert d["vs_baseline"] == pytest.approx(d["value"] / 125.0, abs=5e-3)


def test_every_shipped_preset_has_a_quality_artifact():
    """Matrix rows carry the preset's current test PSNR/SSIM (VERDICT r3
    weak #4: a speed win must not silently degrade quality). Every shipped
    preset therefore needs a committed infer artifact, and preset_quality
    must surface it with the expected schema."""
    import bench
    from pdunet_tpu.configs import PRESETS

    for name in PRESETS:
        q = bench.preset_quality(name)
        assert q, f"missing artifacts/{name}_test.json for shipped preset"
        assert 10.0 < q["test_psnr"] < 100.0
        assert 0.0 < q["test_ssim"] <= 1.0
        assert q["quality_artifact"] == f"artifacts/{name}_test.json"


@pytest.mark.slow  # minutes-scale on the 1-core box
def test_matrix_row_carries_quality_at_shipped_geometry():
    import bench

    row = bench.bench_preset_recon("pdunet_parallel", 2)  # shipped geometry
    assert "test_psnr" in row and "test_ssim" in row
    # geometry-overridden scale-scan rows must NOT claim the shipped quality
    row32 = bench.bench_preset_recon("pdunet_parallel", 2, image_size=32,
                                     n_angles=48)
    assert "test_psnr" not in row32
