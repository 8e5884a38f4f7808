"""Device-array quirk handling for the axon TPU backend.

The axon relay cannot read back *directly-transferred* device buffers
(UNIMPLEMENTED), only compute-produced ones. Closure-captured plan arrays
get embedded into HLO as literals at lowering time — which requires exactly
such a readback. ``materialize`` routes every array through a trivial
on-device add so the buffer is compute-produced; each distinct shape/dtype
costs one (persistently cached) compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["materialize"]


def materialize(tree):
    """Return ``tree`` with every jax.Array replaced by a computed copy."""

    def fix(x):
        if isinstance(x, jax.Array):
            return x + jnp.zeros((), x.dtype)
        return x

    return jax.tree_util.tree_map(fix, tree)
