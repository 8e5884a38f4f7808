"""Non-uniform FFT for golden-angle radial MRI (SURVEY.md §2b C2, §2c).

TPU-native replacement for torchkbnufft: the trajectory is static per
geometry, so Kaiser-Bessel interpolation reduces to precomputed gather
(type-2 forward) / scatter-add (type-1 adjoint) taps around an oversampled
XLA FFT — no iterative interpolation on device, exact transpose pairs.
"""

from pdunet_tpu.ops.nufft.nufft import (
    NufftPlan,
    build_nufft_plan,
    make_radial_ops,
    nufft_adjoint,
    nufft_forward,
    radial_dcf,
    radial_dcf_pipe_menon,
)

__all__ = [
    "NufftPlan",
    "build_nufft_plan",
    "make_radial_ops",
    "nufft_adjoint",
    "nufft_forward",
    "radial_dcf",
    "radial_dcf_pipe_menon",
]
