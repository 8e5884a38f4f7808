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


def test_out_of_range(h5path):
    ds = SliceDataset(h5path, split="val")
    with pytest.raises(IndexError):
        ds[len(ds)]
