"""Native C++ data engine vs the NumPy oracles (SURVEY.md §2c native list)."""

import numpy as np
import pytest

from pdunet_tpu.data import native, phantoms


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


def test_rasterizer_matches_numpy(rng):
    ell = phantoms.random_ellipses(rng, 6, radius=28.0)
    a = native.rasterize_ellipses(ell, 64, supersample=4)
    b = phantoms.rasterize_ellipses(ell, 64, supersample=4)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sinogram_matches_numpy(rng):
    ell = phantoms.random_ellipses(rng, 4, radius=28.0)
    angles = np.linspace(0, np.pi, 37, endpoint=False)
    a = native.analytic_parallel_sinogram(ell, angles, 64)
    b = phantoms.analytic_parallel_sinogram(ell, angles, 64)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-5)


def test_phantom_batch_deterministic():
    a = native.phantom_batch(seed=7, batch=3, image_size=32)
    b = native.phantom_batch(seed=7, batch=3, image_size=32)
    c = native.phantom_batch(seed=8, batch=3, image_size=32)
    assert a is not None
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.isfinite(a).all() and a.std() > 0


def test_prefetcher_overlaps():
    produced = []

    def make(i):
        arr = native.phantom_batch(seed=i, batch=1, image_size=16)
        produced.append(i)
        return i, arr

    pf = native.HostPrefetcher(make, depth=2)
    got = [next(pf)[0] for _ in range(4)]
    pf.close()
    assert got == [0, 1, 2, 3]


def test_prefetcher_propagates_producer_error():
    def make(i):
        if i == 1:
            raise ValueError("boom at 1")
        return i

    pf = native.HostPrefetcher(make, depth=2)
    assert next(pf) == 0
    with pytest.raises(RuntimeError, match="producer failed"):
        # item 1's exception surfaces here instead of hanging the consumer
        next(pf)
    pf.close()
