"""Data pipeline: phantoms, sinogram synthesis, undersampling, normalization.

Replaces the reference's per-branch torch Dataset/DataLoader stack
(SURVEY.md §2b C4/C12) with on-device pure-JAX synthesis plus optional
file-backed loaders.
"""
