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


@pytest.mark.parametrize("contract_x", [True, False])
def test_fwd_kernel_matches_einsum(plan, contract_x, rng):
    f = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    pos = plan.pos_x if contract_x else plan.pos_y
    shift = plan.shift_x if contract_x else plan.shift_y
    L = plan.meta["S_ext"]
    ref = _project_group(f, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x)
    out = project_group_pallas(
        f, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x, interpret=True
    )
    assert rel(out, ref) < 1e-5


@pytest.mark.parametrize("contract_x", [True, False])
def test_adj_kernel_matches_einsum(plan, contract_x, rng):
    A_g = (plan.pos_x if contract_x else plan.pos_y).shape[0]
    p = jnp.asarray(rng.standard_normal((2, A_g, 32)), jnp.float32)
    pos = plan.pos_x if contract_x else plan.pos_y
    shift = plan.shift_x if contract_x else plan.shift_y
    L = plan.meta["S_ext"]
    ref = _backproject_group(p, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x)
    out = backproject_group_pallas(
        p, pos, shift, plan.spec, plan.Wc, plan.Ws, L, contract_x, 32, interpret=True
    )
    assert rel(out, ref) < 1e-5
