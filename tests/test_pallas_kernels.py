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


# ---------------------------------------------------------------------------
# Mirror-pair kernels (geometry.py pair_group): stage-1 matmuls shared
# across θ ↔ π−θ pairs. Twin agreement is against the pair einsum twin
# (same plan arrays); equivalence with the per-angle operator is a separate
# (slightly looser) check because pairing substitutes prim_b by ±prim_a of
# independently f32-rounded plan rows.
# ---------------------------------------------------------------------------

from pdunet_tpu.ops.radon.pallas_kernels import (  # noqa: E402
    backproject_pair_group_pallas,
    project_pair_group_pallas,
)
from pdunet_tpu.ops.radon.parallel import (  # noqa: E402
    _backproject_pair_group,
    _project_pair_group,
    parallel_backproject,
    parallel_project,
)


def _pair_arrays(plan, grp):
    return tuple(
        getattr(plan, f"pair_{nm}_{grp}") for nm in ("pos", "sha", "shb", "sgn", "msk")
    )


def test_pairing_metadata(plan):
    m = plan.meta
    assert m["use_pairs"]
    # uniform [0,π) scans pair all but the self-mirror angles
    assert m["P_x"] + m["P_y"] < m["A_x"] + m["A_y"]
    assert len(m["pair_take_x"]) == 2 * m["P_x"]
    assert len(m["pair_take_y"]) == 2 * m["P_y"]
    assert sorted(set(m["pair_inv_perm"])) == sorted(m["pair_inv_perm"])
    # every angle must be assigned a pair row: an unassigned (-1) entry
    # would be silently clipped to row 0 by jnp.take at runtime
    assert min(m["pair_inv_perm"]) >= 0
    assert len(m["pair_inv_perm"]) == m["A_x"] + m["A_y"]


def test_golden_angle_plans_skip_pairing():
    import math

    from pdunet_tpu.geometry import GOLDEN_ANGLE

    angles = tuple((k * GOLDEN_ANGLE) % math.pi for k in range(16))
    p = build_parallel_plan(ParallelGeometry(image_size=32, angles=angles))
    assert not p.meta["use_pairs"]


@pytest.mark.parametrize("contract_x", [True, False])
@pytest.mark.parametrize("bf16,tol", _BF16, ids=["f32", "bf16"])
def test_fwd_pair_kernel_matches_einsum(plan, contract_x, bf16, tol, rng):
    f = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    pos, sha, shb, sgn, _ = _pair_arrays(plan, "x" if contract_x else "y")
    L = plan.meta["S_ext"]
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    ref = _project_pair_group(
        f, pos, sha, shb, sgn, plan.spec, plan.Wc, plan.Ws, L, contract_x, cdt=cdt
    )
    out = project_pair_group_pallas(
        f, pos, sha, shb, sgn, plan.spec, plan.Wc, plan.Ws, L, contract_x,
        interpret=True, bf16=bf16,
    )
    assert rel(out, ref) < tol


@pytest.mark.parametrize("contract_x", [True, False])
@pytest.mark.parametrize("bf16,tol", _BF16, ids=["f32", "bf16"])
def test_adj_pair_kernel_matches_einsum(plan, contract_x, bf16, tol, rng):
    pos, sha, shb, sgn, msk = _pair_arrays(plan, "x" if contract_x else "y")
    p = jnp.asarray(rng.standard_normal((2, 2 * pos.shape[0], 32)), jnp.float32)
    L = plan.meta["S_ext"]
    ref = _backproject_pair_group(
        p, pos, sha, shb, sgn, msk, plan.spec, plan.Wc, plan.Ws, L, contract_x,
        cdt=jnp.bfloat16 if bf16 else jnp.float32,
    )
    out = backproject_pair_group_pallas(
        p, pos, sha, shb, sgn, msk, plan.spec, plan.Wc, plan.Ws, L, contract_x,
        32, interpret=True, bf16=bf16,
    )
    assert rel(out, ref) < tol


@pytest.mark.parametrize("n_angles", [24, 21])
def test_pair_product_path_matches_per_angle(n_angles, rng):
    """Full routed pallas pair path (perm + take + mask) ≡ the per-angle
    einsum operator, including unpaired leftovers at odd angle counts."""
    geom = ParallelGeometry(image_size=32, n_angles=n_angles, det_count=32)
    plan = build_parallel_plan(geom)
    assert plan.meta["use_pairs"]
    f = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    sino_pair = parallel_project(plan, f, impl="pallas", interpret=True)
    sino_ref = parallel_project(plan, f, impl="einsum")
    assert rel(sino_pair, sino_ref) < 2e-5
    q = jnp.asarray(rng.standard_normal(sino_ref.shape), jnp.float32)
    bp_pair = parallel_backproject(plan, q, impl="pallas", interpret=True)
    bp_ref = parallel_backproject(plan, q, impl="einsum")
    assert rel(bp_pair, bp_ref) < 2e-5
    # the routed pair fwd/adj must themselves be an exact transpose pair
    lhs = float(jnp.vdot(sino_pair, q))
    rhs = float(jnp.vdot(f, bp_pair))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5
