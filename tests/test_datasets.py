"""File-backed dataset IO tests (SURVEY.md §2b C12)."""

import numpy as np
import pytest

from pdunet_tpu.data.datasets import (
    SliceDataset,
    iterate_batches,
    write_phantom_dataset,
)


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "slices.h5"
    return write_phantom_dataset(str(path), n_slices=20, image_size=32, seed=1)


def test_splits_partition(h5path):
    sizes = {s: len(SliceDataset(h5path, split=s)) for s in ("train", "val", "test")}
    assert sum(sizes.values()) == 20
    assert sizes["train"] == 16


def test_slices_shape_and_determinism(h5path):
    ds = SliceDataset(h5path, split="train")
    a = ds[0]
    assert a.shape == (32, 32) and a.dtype == np.float32
    assert np.array_equal(a, SliceDataset(h5path, split="train")[0])


def test_batch_iterator(h5path):
    ds = SliceDataset(h5path, split="train")
    batches = list(iterate_batches(ds, 4, seed=0, epochs=1))
    assert len(batches) == 4
    assert batches[0].shape == (4, 32, 32)
    # same seed → same order
    batches2 = list(iterate_batches(ds, 4, seed=0, epochs=1))
    assert np.array_equal(batches[0], batches2[0])


def test_complex_dataset(tmp_path):
    path = write_phantom_dataset(
        str(tmp_path / "c.h5"), n_slices=6, image_size=16, complex_phase=True
    )
    ds = SliceDataset(path, split="train")
    assert ds.is_complex
    assert ds[0].dtype == np.complex64


def test_hu_domain_converts_on_read(tmp_path):
    """CT volumes ingested in Hounsfield units come back as relative
    attenuation (water→1, air→0), matching the scale every task trains in
    (SURVEY.md §2b C4 HU↔μ conversion)."""
    from pdunet_tpu.data.datasets import convert_volume

    hu = np.stack([np.full((16, 16), v, np.float32) for v in (-1000, 0, 400)])
    path = convert_volume(hu, str(tmp_path / "hu.h5"), domain="hu",
                          train_frac=1.0, val_frac=0.0)
    ds = SliceDataset(path, split="train")
    assert ds.domain == "hu"
    np.testing.assert_allclose(ds[0], 0.0, atol=1e-6)   # air
    np.testing.assert_allclose(ds[1], 1.0, atol=1e-6)   # water
    np.testing.assert_allclose(ds[2], 1.4, atol=1e-6)   # soft tissue/bone-ish
    with pytest.raises(ValueError):
        convert_volume(hu, str(tmp_path / "bad.h5"), domain="parsecs")


def test_out_of_range(h5path):
    ds = SliceDataset(h5path, split="val")
    with pytest.raises(IndexError):
        ds[len(ds)]


def test_hu_volume_trains_and_evaluates_end_to_end(tmp_path):
    """The reference's CT pipeline is HU-native (SURVEY.md §2b C4/C12): a
    Hounsfield-unit volume ingested via convert_volume(domain="hu") must
    train file-backed and evaluate through infer.py's windowed-HU scoring
    path without any manual normalization."""
    import dataclasses

    import numpy as np

    import infer
    from pdunet_tpu.configs import get_preset
    from pdunet_tpu.data.datasets import convert_volume
    from pdunet_tpu.data.phantoms import random_ellipses, rasterize_ellipses
    from pdunet_tpu.training.loop import train

    # synthetic "CT volume" in HU: densities (≈ μ/μ_water) → HU
    rng = np.random.default_rng(3)
    slices = np.stack([
        np.asarray(rasterize_ellipses(
            random_ellipses(rng, 4, 0.45 * 32, nonneg=True), 32))
        for _ in range(12)
    ])
    hu = 1000.0 * (slices - 1.0)  # rel. attenuation → Hounsfield
    path = convert_volume(hu, str(tmp_path / "ct_hu.h5"), domain="hu",
                          train_frac=0.7, val_frac=0.15)

    config = get_preset("fbp_unet_parallel")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=40, sparsity=4
        ),
        model=dataclasses.replace(config.model, base_features=8, depth=2,
                                  use_bfloat16=False),
        train=dataclasses.replace(
            config.train, batch_size=4, steps=5, warmup_steps=1,
            log_every=5, eval_every=1000, val_slices=4,
            ckpt_dir=str(tmp_path / "ckpt"),
        ),
    )
    result = train(config, data=path, verbose=False)
    assert np.isfinite(result.final_eval["psnr"])

    # infer.py end-to-end with clinical-window scoring (the
    # normalize_ct_window consumer): wide 2000-HU window around 0
    json_out = tmp_path / "hu_eval.json"
    rc = infer.main([
        "--preset", "fbp_unet_parallel",
        "--set", "geometry.image_size=32", "--set", "geometry.n_angles=40",
        "--set", "model.base_features=8", "--set", "model.depth=2",
        "--set", "model.use_bfloat16=false", "--set", "train.batch_size=4",
        "--ckpt-dir", str(tmp_path / "ckpt"), "--data", path,
        # the tiny test split (2 slices) needs a matching eval batch
        "--batch", "2",
        "--split", "test", "--hu-window", "0", "2000",
        "--json-out", str(json_out),
    ])
    assert rc == 0
    import json

    table = json.loads(json_out.read_text())
    assert table["n_slices"] >= 1
    assert np.isfinite(table["psnr_mean"])
    assert 0.0 <= table["ssim_mean"] <= 1.0
