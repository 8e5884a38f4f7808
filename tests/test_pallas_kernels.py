"""Pallas fused projector vs its einsum jnp twin (SURVEY.md §4.2 tier 4 —
interpreter mode is the CPU stand-in for the TPU kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdunet_tpu.geometry import ParallelGeometry, build_parallel_plan
from pdunet_tpu.ops.radon.pallas_kernels import (
    backproject_group_pallas,
    project_group_pallas,
)
from pdunet_tpu.ops.radon.parallel import _backproject_group, _project_group

GEOM = ParallelGeometry(image_size=32, n_angles=24, det_count=32)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.fixture(scope="module")
def plan():
    return build_parallel_plan(GEOM)


# bf16 runs both the kernel and the einsum twin with bf16 matmul operands
# (f32 accumulate): agreement is to op-ordering differences, ~1e-3
_BF16 = [(False, 1e-5), (True, 5e-3)]


@pytest.mark.parametrize("contract_x", [True, False])
@pytest.mark.parametrize("bf16,tol", _BF16, ids=["f32", "bf16"])
def test_fwd_kernel_matches_einsum(plan, contract_x, bf16, tol, rng):
    f = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    pos = plan.pos_x if contract_x else plan.pos_y
    shift = plan.shift_x if contract_x else plan.shift_y
    L = plan.meta["S_ext"]
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    ref = _project_group(
        f, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x, cdt=cdt
    )
    out = project_group_pallas(
        f, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x,
        interpret=True, bf16=bf16,
    )
    assert rel(out, ref) < tol


@pytest.mark.parametrize("contract_x", [True, False])
@pytest.mark.parametrize("bf16,tol", _BF16, ids=["f32", "bf16"])
def test_adj_kernel_matches_einsum(plan, contract_x, bf16, tol, rng):
    A_g = (plan.pos_x if contract_x else plan.pos_y).shape[0]
    p = jnp.asarray(rng.standard_normal((2, A_g, 32)), jnp.float32)
    pos = plan.pos_x if contract_x else plan.pos_y
    shift = plan.shift_x if contract_x else plan.shift_y
    L = plan.meta["S_ext"]
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    ref = _backproject_group(
        p, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x, cdt=cdt
    )
    out = backproject_group_pallas(
        p, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x, 32,
        interpret=True, bf16=bf16,
    )
    assert rel(out, ref) < tol
