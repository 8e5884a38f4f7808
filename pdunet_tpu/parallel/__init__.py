"""Multi-chip parallelism (SURVEY.md §2d, §5.8).

The scale axis for this workload is the batch (data parallelism): 256²
slice reconstruction at ≥1000/s on a v5e-8 = 8 chips × ≥125/s. XLA
collectives over ICI are emitted automatically by jit under NamedSharding —
no hand-written comm code (this IS the TPU-native NCCL replacement).

The mesh also declares an ``angle`` axis (unused by default): forward
projection is angle-separable, so very large geometries can shard the
sinogram's angle dimension with a psum on the adjoint — the domain analogue
of sequence parallelism (SURVEY.md §5.7).
"""

from pdunet_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch_spec,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_step",
    "replicate",
    "shard_batch_spec",
]
