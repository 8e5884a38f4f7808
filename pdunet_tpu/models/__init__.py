"""Model zoo: UNet, Learned Primal-Dual, Primal-Dual UNet (SURVEY.md §2b C5-C7).

All models are flax linen modules operating on NHWC tensors. Physics enters
only through operator bundles (``RadonOps``-style callables) passed at
construction — models never see geometry internals (SURVEY.md §7 tenets).
"""

from pdunet_tpu.models.unet import UNet

__all__ = ["UNet"]
