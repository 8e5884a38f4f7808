"""ctypes bindings for the native host-side data engine (native/).

Replaces the reference's torch-DataLoader C++ worker layer (SURVEY.md §2b
C4/C12 native path): multithreaded phantom rasterization and analytic
sinogram synthesis in C++ (native/pdunet_native.cpp), with transparent
NumPy fallbacks when the shared library hasn't been built. The library is
auto-built with `make -C native` on first use if a compiler is available.

The C entry points release the GIL (pure C ABI), so HostPrefetcher gets
real parallelism between synthesis and device execution.
"""

from __future__ import annotations

import ctypes
import pathlib
import queue
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

__all__ = [
    "available",
    "rasterize_ellipses",
    "analytic_parallel_sinogram",
    "phantom_batch",
    "HostPrefetcher",
]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpdunet_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.pdunet_rasterize.argtypes = [
        dp, ctypes.c_int, fp, ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ]
    lib.pdunet_analytic_sinogram.argtypes = [
        dp, ctypes.c_int, dp, ctypes.c_int, fp, ctypes.c_int, ctypes.c_double, ctypes.c_int,
    ]
    lib.pdunet_phantom_batch.argtypes = [
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int, fp, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(arr, dtype):
    a = np.ascontiguousarray(arr, dtype)
    return a, a.ctypes.data_as(
        ctypes.POINTER(ctypes.c_double if dtype == np.float64 else ctypes.c_float)
    )


def rasterize_ellipses(
    ellipses: np.ndarray, image_size: int, pixel_spacing: float = 1.0,
    supersample: int = 4, n_threads: int = 0,
) -> np.ndarray:
    """Native rasterizer; falls back to the NumPy oracle if unavailable."""
    lib = _load()
    if lib is None:
        from pdunet_tpu.data import phantoms

        return phantoms.rasterize_ellipses(ellipses, image_size, pixel_spacing, supersample)
    ell, ell_p = _as_c(ellipses, np.float64)
    out = np.empty((image_size, image_size), np.float32)
    lib.pdunet_rasterize(
        ell_p, len(ell), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        image_size, pixel_spacing, supersample, n_threads,
    )
    return out


def analytic_parallel_sinogram(
    ellipses: np.ndarray, angles: np.ndarray, det_count: int,
    det_spacing: float = 1.0, n_threads: int = 0,
) -> np.ndarray:
    lib = _load()
    if lib is None:
        from pdunet_tpu.data import phantoms

        return phantoms.analytic_parallel_sinogram(ellipses, angles, det_count, det_spacing)
    ell, ell_p = _as_c(ellipses, np.float64)
    ang, ang_p = _as_c(angles, np.float64)
    out = np.empty((len(ang), det_count), np.float32)
    lib.pdunet_analytic_sinogram(
        ell_p, len(ell), ang_p, len(ang),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        det_count, det_spacing, n_threads,
    )
    return out


def phantom_batch(
    seed: int, batch: int, image_size: int, n_ellipses: int = 8,
    pixel_spacing: float = 1.0, supersample: int = 2,
    radius_frac: float = 0.45, n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Native random phantom batch (None if the library is unavailable —
    the PRNG is C++-side, so there is no NumPy-identical fallback)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((batch, image_size, image_size), np.float32)
    lib.pdunet_phantom_batch(
        seed, batch, n_ellipses,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        image_size, pixel_spacing, supersample, radius_frac, n_threads,
    )
    return out


class _ProducerError:
    """Wrapper carrying a producer-thread exception across the queue."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class HostPrefetcher:
    """Background-thread batch producer over a bounded queue.

    The native synthesis releases the GIL, so production overlaps with the
    device step (the role of the reference's DataLoader worker processes,
    without processes).
    """

    def __init__(self, make_batch, depth: int = 2):
        self._make = make_batch
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._idx = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            try:
                item = self._make(self._idx)
            except BaseException as exc:  # surfaced in __next__, not lost
                item = _ProducerError(exc)
            self._idx += 1
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if isinstance(item, _ProducerError):
                return

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, _ProducerError):
            raise RuntimeError("HostPrefetcher producer failed") from item.exc
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
