"""File-backed dataset IO (SURVEY.md §2b C12).

The reference reads medical-image slices from per-branch dataset classes
(HDF5/NIfTI; torch DataLoader with worker processes). Here:

* ``SliceDataset`` — HDF5-backed slice store with deterministic
  train/val/test splits (h5py is in the image; nibabel/pydicom are not, so
  NIfTI/DICOM ingestion goes through ``convert_volume`` offline).
* ``write_phantom_dataset`` — generates a reproducible synthetic HDF5
  dataset (the offline stand-in for LIDC/fastMRI-style data).
* ``iterate_batches`` — a simple double-buffered host→device pipeline; for
  synthetic training the on-device synthesis path (data/synth.py) is
  preferred and this loader exists for real data parity.

Layout: one HDF5 file, dataset ``slices`` of shape (n, N, N) float32
(+ optional ``phase`` for complex MRI), attribute ``splits`` storing the
(train, val, test) counts. Slices are stored contiguously per split.

An optional ``domain`` attribute declares the pixel units. ``"density"``
(default) is the O(1) relative-attenuation scale every task trains in;
``"hu"`` marks CT data in Hounsfield units (the reference's CT datasets,
SURVEY.md §2b C4/C12), which ``SliceDataset`` converts on read to relative
attenuation μ/μ_water = 1 + HU/1000 (water→1, air→0) so file-backed HU
volumes drop into the same training/eval paths as phantom densities.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["SliceDataset", "write_phantom_dataset", "iterate_batches"]


@dataclasses.dataclass
class SliceDataset:
    """HDF5 slice store with named splits."""

    path: str
    split: str = "train"

    def __post_init__(self):
        import h5py

        self._file = h5py.File(self.path, "r")
        self._slices = self._file["slices"]
        counts = tuple(int(c) for c in self._file.attrs["splits"])
        starts = (0, counts[0], counts[0] + counts[1])
        names = ("train", "val", "test")
        if self.split not in names:
            raise ValueError(f"split must be one of {names}")
        i = names.index(self.split)
        self._start = starts[i]
        self._count = counts[i]
        self._complex = "phase" in self._file
        self._domain = str(self._file.attrs.get("domain", "density"))
        if self._domain not in ("density", "hu"):
            raise ValueError(f"unknown slice domain {self._domain!r}")

    def __len__(self) -> int:
        return self._count

    @property
    def image_size(self) -> int:
        return int(self._slices.shape[-1])

    @property
    def is_complex(self) -> bool:
        return self._complex

    @property
    def domain(self) -> str:
        return self._domain

    def __getitem__(self, idx: int) -> np.ndarray:
        if not 0 <= idx < self._count:
            raise IndexError(idx)
        mag = np.asarray(self._slices[self._start + idx], np.float32)
        if self._domain == "hu":
            mag = 1.0 + mag / 1000.0  # HU → relative attenuation μ/μ_water
        if self._complex:
            phase = np.asarray(self._file["phase"][self._start + idx], np.float32)
            return (mag * np.exp(1j * phase)).astype(np.complex64)
        return mag

    def batch(self, indices) -> np.ndarray:
        return np.stack([self[int(i)] for i in indices])

    def close(self):
        self._file.close()


def write_phantom_dataset(
    path: str,
    n_slices: int,
    image_size: int,
    splits: Tuple[float, float, float] = (0.8, 0.1, 0.1),
    n_ellipses: int = 8,
    seed: int = 0,
    complex_phase: bool = False,
) -> str:
    """Write a reproducible random-ellipse HDF5 dataset."""
    import h5py

    from pdunet_tpu.data import native
    from pdunet_tpu.data.phantoms import random_ellipses

    rng = np.random.default_rng(seed)
    radius = 0.45 * image_size
    with h5py.File(path, "w") as f:
        ds = f.create_dataset(
            "slices", (n_slices, image_size, image_size), np.float32
        )
        ph = (
            f.create_dataset("phase", (n_slices, image_size, image_size), np.float32)
            if complex_phase
            else None
        )
        for i in range(n_slices):
            # native multithreaded rasterizer when built; NumPy fallback.
            # Complex (MRI) datasets store nonneg magnitudes — see
            # data/synth.py sample_ellipse_params on why signed densities
            # are wrong for the |image| target.
            ds[i] = native.rasterize_ellipses(
                random_ellipses(rng, n_ellipses, radius, nonneg=complex_phase),
                image_size,
            )
            if ph is not None:
                ax = np.linspace(-1, 1, image_size)
                X, Y = np.meshgrid(ax, ax)
                c = rng.uniform(-np.pi, np.pi, 4)
                ph[i] = c[0] * X + c[1] * Y + c[2] * X * Y + c[3] * (X**2 - Y**2)
        n_train = int(round(splits[0] * n_slices))
        n_val = int(round(splits[1] * n_slices))
        f.attrs["splits"] = (n_train, n_val, n_slices - n_train - n_val)
    return path


def convert_volume(volume: np.ndarray, out_path: str, axis: int = 0,
                   domain: str = "density", **kw) -> str:
    """Slice a 3D volume (e.g. loaded from NIfTI elsewhere) into the HDF5
    layout. ``domain="hu"`` marks CT Hounsfield data; ``SliceDataset``
    converts it to relative attenuation on read. Other normalization /
    windowing is the caller's business."""
    import h5py

    if domain not in ("density", "hu"):
        raise ValueError(f"unknown slice domain {domain!r}")
    vol = np.moveaxis(np.asarray(volume, np.float32), axis, 0)
    with h5py.File(out_path, "w") as f:
        f.create_dataset("slices", data=vol)
        n = vol.shape[0]
        n_train = int(round(kw.get("train_frac", 0.8) * n))
        n_val = int(round(kw.get("val_frac", 0.1) * n))
        f.attrs["splits"] = (n_train, n_val, n - n_train - n_val)
        f.attrs["domain"] = domain
    return out_path


def iterate_batches(
    dataset: SliceDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    epochs: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Host-side batch iterator (deterministic given the seed)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_remainder else n
        for lo in range(0, stop, batch_size):
            yield dataset.batch(order[lo : lo + batch_size])
        epoch += 1
