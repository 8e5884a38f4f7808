"""Physics operators: differentiable projectors, FBP, NUFFT, metrics, losses.

TPU-native replacement for the reference stack's native compute layer
(torch-radon CUDA projectors + torchkbnufft; SURVEY.md §2c). Every operator
is a pure function, linear in its data argument, exposed with an exact
adjoint pair wired through ``jax.custom_vjp``.
"""
