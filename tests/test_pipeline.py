"""Undersampling/upsampling transforms (SURVEY.md §2b C4)."""

import jax.numpy as jnp
import numpy as np

from pdunet_tpu.data.pipeline import interp_upsample_angles, subsample_angles


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
