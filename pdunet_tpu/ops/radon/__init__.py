"""Radon transforms (parallel- and fan-beam) and filtered backprojection.

TPU-native replacement for torch-radon (SURVEY.md §2b C1, §2c): the CUDA
texture-sampled ray integrals become static-weight MXU matmul/conv pipelines
(parallel beam) and XLA-gather pixel-driven kernels (fan beam), with exact
transpose adjoints instead of torch-radon's only-approximately-adjoint
ray-driven/pixel-driven pair.
"""

from pdunet_tpu.ops.radon.parallel import (
    make_parallel_ops,
    parallel_project,
    parallel_backproject,
    parallel_project_ref,
    set_default_impl,
    RadonOps,
)
from pdunet_tpu.ops.radon.fan import make_fan_ops, fan_project, fan_backproject
from pdunet_tpu.ops.radon.filtering import filter_sinogram, ramp_kernel, FILTERS

__all__ = [
    "make_parallel_ops",
    "make_fan_ops",
    "parallel_project",
    "parallel_backproject",
    "parallel_project_ref",
    "fan_project",
    "fan_backproject",
    "filter_sinogram",
    "ramp_kernel",
    "FILTERS",
    "set_default_impl",
    "RadonOps",
]
