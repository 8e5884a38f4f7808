"""pdunet_tpu — a TPU-native tomographic reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of phernst/pd-unet
(reference README.md:3 names arXiv:2112.13443, "Sinogram upsampling using
Primal-Dual UNet for undersampled CT and radial MRI reconstruction").

The reference split CT and MRI across git branches (reference README.md:5);
this framework unifies them: a geometry is a config object, the physics
operators (Radon / NUFFT forward + adjoint, FBP) are pure jitted functions
with exact custom_vjp adjoint pairs, and the models (UNet, Learned
Primal-Dual, Primal-Dual UNet) are flax modules that receive operator
functions — never geometry internals.

Layering (SURVEY.md §1b):
  L5 CLI            train.py / infer.py / bench.py
  L4 harness        pdunet_tpu.training  (optax/orbax/clu)
  L3 models         pdunet_tpu.models    (flax)
  L2 operators      pdunet_tpu.ops       (jnp + Pallas, custom_vjp)
  L1 data           pdunet_tpu.data
  L0 runtime        JAX/XLA on TPU, jax.sharding for multi-chip
"""

__version__ = "0.1.0"
