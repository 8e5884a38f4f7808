"""Undersampling/upsampling transforms (SURVEY.md §2b C4)."""

import jax
import jax.numpy as jnp
import numpy as np

from pdunet_tpu.data.pipeline import (
    interp_upsample_angles,
    kspace_gaussian_noise,
    subsample_angles,
)


def _dense_sino(n_angles, n_det, coverage=1.0):
    """Smooth synthetic sinogram p(θ, s) with the parallel-beam symmetry
    p(θ+π, s) = p(θ, −s) built in (a single off-center Gaussian blob)."""
    th = coverage * np.pi * np.arange(n_angles) / n_angles
    s = np.arange(n_det) - (n_det - 1) / 2.0
    # blob at radius r0, azimuth φ0 → trace s0(θ) = r0·cos(θ − φ0)
    s0 = 12.0 * np.cos(th - 0.7)[:, None]
    return jnp.asarray(np.exp(-((s[None, :] - s0) ** 2) / 30.0), jnp.float32)


def test_interp_matches_dense_full_coverage():
    dense = _dense_sino(40, 33)
    sparse = subsample_angles(dense, 4)
    up = interp_upsample_angles(sparse, 4)
    assert up.shape == dense.shape
    # plain linear-interp error of a narrow Gaussian trace peaks ~0.11;
    # a wrong wrap (no detector flip) would be ~0.9 (full amplitude)
    err = float(jnp.abs(up - dense).max())
    assert err < 0.15, f"interp error {err}"
    # the wrap segment (last factor-1 angles) must be just as close — this
    # is where the flipped periodic extension matters
    wrap_err = float(jnp.abs(up[-3:] - dense[-3:]).max())
    assert wrap_err < 0.15, f"wrap segment error {wrap_err}"


def test_interp_limited_angle_clamps_not_wraps():
    # limited-angle: angle 0 is NOT adjacent to the last angle, so the tail
    # must clamp to the last measured view instead of blending a flipped
    # angle-0 view in
    dense = _dense_sino(40, 33, coverage=0.5)
    sparse = subsample_angles(dense, 4)
    up = interp_upsample_angles(sparse, 4, angular_coverage=0.5)
    assert up.shape == dense.shape
    # tail rows equal the last measured angle exactly (nearest extrapolation)
    tail = np.asarray(up[-3:])
    last = np.broadcast_to(np.asarray(up[36]), tail.shape)
    np.testing.assert_allclose(tail, last, atol=1e-6)
    # and the wrapping variant would be badly wrong here: check we beat it
    wrong = interp_upsample_angles(sparse, 4)  # full-coverage wrap semantics
    err_clamp = float(jnp.abs(up - dense).max())
    err_wrap = float(jnp.abs(wrong - dense).max())
    assert err_clamp < err_wrap


def test_kspace_noise_snr_and_disable():
    """The injected complex noise realizes the requested power SNR, is
    circularly symmetric, and snr_db<=0 is the exact noiseless identity."""
    key = jax.random.PRNGKey(7)
    # big enough that the empirical SNR concentrates (~1% rel error at 64k)
    g = (jnp.ones((4, 128, 128)) * (1.0 + 0.5j)).astype(jnp.complex64)
    for snr_db in (20.0, 40.0):
        noisy = kspace_gaussian_noise(key, g, snr_db)
        n = noisy - g
        sig_p = float(jnp.mean(jnp.abs(g) ** 2))
        noise_p = float(jnp.mean(jnp.abs(n) ** 2))
        got_db = 10.0 * np.log10(sig_p / noise_p)
        assert abs(got_db - snr_db) < 0.2, f"SNR {got_db:.2f} vs {snr_db}"
        # circular symmetry: Re/Im powers match to a few percent
        re_p = float(jnp.mean(jnp.real(n) ** 2))
        im_p = float(jnp.mean(jnp.imag(n) ** 2))
        assert abs(re_p - im_p) / (re_p + im_p) < 0.05
    assert (kspace_gaussian_noise(key, g, 0.0) == g).all()
    assert (kspace_gaussian_noise(key, g, -5.0) == g).all()


def test_kspace_noise_per_slice_normalization():
    """SNR is defined per slice: a slice with 10× amplitude gets 10× noise."""
    key = jax.random.PRNGKey(3)
    base = jax.random.normal(key, (1, 64, 64), dtype=jnp.complex64)
    g = jnp.concatenate([base, 10.0 * base], axis=0)
    n = kspace_gaussian_noise(jax.random.PRNGKey(11), g, 30.0) - g
    p0 = float(jnp.mean(jnp.abs(n[0]) ** 2))
    p1 = float(jnp.mean(jnp.abs(n[1]) ** 2))
    ratio = p1 / p0
    assert 80.0 < ratio < 125.0, f"noise power ratio {ratio}"
