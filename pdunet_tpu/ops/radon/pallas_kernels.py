"""Pallas TPU kernels: fused factored projector (SURVEY.md §2c).

The einsum pipeline (ops/radon/parallel.py) materializes the (B, A, N, K)
spectral intermediates in HBM (~1.3 GB round-trip per call at 256²/90
angles/batch 16). These kernels fuse the whole per-angle chain —

    generate T̂, φ (VPU trig) → f·T̂ (MXU) → φ-multiply + row-reduce (VPU)
    → Ŝ·W (MXU)

— inside VMEM: the image block stays resident across the (innermost,
sequential) angle axis, per-angle tensors live and die on-chip, and HBM
sees only the image once plus the sinogram block. The adjoint kernel is the
exact transpose, accumulating the image across the angle axis.

TPU block-shape rules (last two dims divisible by (8, 128) or equal to the
array dims) force small per-angle operands to be kept fully VMEM-resident
and row-indexed dynamically with the angle program id.

Every kernel has the einsum path as its jnp twin (SURVEY.md §4.2 tier 4):
tests assert allclose in interpreter mode, and CPU runs use the twin.

Two kernel families:

* per-angle (``project_group_pallas``) — one grid step per angle; used
  whenever the plan's angle set doesn't pair (golden-angle backings).
* mirror-pair (``project_pair_group_pallas``) — one grid step per angle
  PAIR θ ↔ π−θ (geometry.py pair_group): the stage-1 matmul — ~95% of
  projector FLOPs — runs once per pair and serves both members via
  spectral conjugation, nearly halving MXU work on uniform scans. Used
  whenever plan.meta["use_pairs"], both unsharded and angle-sharded
  (parallel/angle_shard.py shards the pair axis, so the sharing
  survives sharding).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "project_group_pallas", "backproject_group_pallas",
    "project_pair_group_pallas", "backproject_pair_group_pallas",
]


def _doubling_trig_rows(th0, dth, N):
    """(cos, sin) of θ(j, k) = th0(k) + j·dth(k) for j = 0..N−1, built from
    the (1, K) seed rows by log2(N) block-doubling complex multiplies
    (e^{i(a+b)} = e^{ia}·e^{ib}): rows [n, 2n) are rows [0, n) rotated by
    the current block rotor e^{i·n·dth}, which is then squared.

    Replaces N·K transcendental evaluations by ~6·N·K mul-adds — the trig
    was the VPU bottleneck of the fused kernels (scripts/trig_proto.py
    measured the fwd pair kernel at 2.01× with free trig; this scheme
    recovers 1.80× on-chip). Phase drift is ~N·eps_f32 from the rotor
    squarings plus the f32 seed rounding — below bf16 resolution, so it is
    only used on the bf16 path (f32 keeps exact trig and its 1e-5 twin
    tolerance). Forward and adjoint kernels generate identical tensors, so
    the exact-transpose adjoint property is unaffected."""
    c, s = jnp.cos(th0), jnp.sin(th0)
    rc, rs = jnp.cos(dth), jnp.sin(dth)
    n = 1
    while n < N:
        c2 = c * rc - s * rs
        s2 = c * rs + s * rc
        c = jnp.concatenate([c, c2], axis=0)
        s = jnp.concatenate([s, s2], axis=0)
        rc, rs = rc * rc - rs * rs, 2.0 * rc * rs
        n *= 2
    return c[:N], s[:N]


def _row_trig(row_ref, a, N, K, L, fast):
    """(cos, sin) of row[a, j]·k·2π/L as (N, K) f32 tensors.

    The plan rows are exactly affine in j (geometry.py group_arrays: pixel
    centers scaled by a direction cosine), so on the fast path the row is
    summarized by its first element and first difference and the trig
    tensor is rebuilt by :func:`_doubling_trig_rows`."""
    row = row_ref[pl.ds(a, 1), :]                        # (1, N)
    if fast and N > 1:
        k = (2.0 * math.pi / L) * lax.broadcasted_iota(
            jnp.int32, (1, K), 1).astype(jnp.float32)
        th0 = row[:, 0:1] * k
        dth = (row[:, 1:2] - row[:, 0:1]) * k
        return _doubling_trig_rows(th0, dth, N)
    k = (2.0 * math.pi / L) * lax.broadcasted_iota(
        jnp.int32, (N, K), 1).astype(jnp.float32)
    ang = row.reshape(N, 1) * k
    return jnp.cos(ang), jnp.sin(ang)


def _angle_tensors(pos_ref, shift_ref, spec_ref, a, N, K, L, cdt):
    """Generate this angle's T̂ (cos/sin) and shear phase (cos/sin) in VMEM.

    Phase math runs in f32; results cast to ``cdt`` so the matmuls run in
    one MXU pass under bf16. Under bf16 the trig itself is replaced by the
    block-doubling recurrence (see :func:`_doubling_trig_rows`)."""
    fast = cdt == jnp.bfloat16
    ct, st = _row_trig(pos_ref, a, N, K, L, fast)
    spec = spec_ref[0, :][None, :]
    tc = (spec * ct).astype(cdt)                         # (N, K)
    ts = (-spec * st).astype(cdt)
    pc, ps = _row_trig(shift_ref, a, N, K, L, fast)
    return tc, ts, pc.astype(cdt), ps.astype(cdt)


def _fwd_kernel(pos_ref, shift_ref, spec_ref, wc_ref, ws_ref, f_ref, out_ref,
                *, L: int, contract_x: bool, cdt):
    B, N, _ = f_ref.shape
    K, S = wc_ref.shape
    a = pl.program_id(1)
    tc, ts, pc, ps = _angle_tensors(pos_ref, shift_ref, spec_ref, a, N, K, L, cdt)
    f = f_ref[...].astype(cdt)
    # contract the image x-axis (dim 2) or y-axis (dim 1) against T̂
    cdim = 2 if contract_x else 1
    dn = (((cdim,), (0,)), ((), ()))
    gr = lax.dot_general(f, tc, dn, preferred_element_type=jnp.float32)
    gi = lax.dot_general(f, ts, dn, preferred_element_type=jnp.float32)
    # gr/gi: (B, rows, K) where rows = the non-contracted image axis
    pcf = pc[None].astype(jnp.float32)
    psf = ps[None].astype(jnp.float32)
    s_re = (gr * pcf - gi * psf).sum(axis=1).astype(cdt)   # (B, K)
    s_im = (gr * psf + gi * pcf).sum(axis=1).astype(cdt)
    out = (
        jnp.dot(s_re, wc_ref[...].astype(cdt), preferred_element_type=jnp.float32)
        - jnp.dot(s_im, ws_ref[...].astype(cdt), preferred_element_type=jnp.float32)
    )
    out_ref[:, pl.ds(a, 1), :] = out[:, None, :]


def _adj_kernel(pos_ref, shift_ref, spec_ref, wc_ref, ws_ref, p_ref, out_ref,
                *, L: int, contract_x: bool, cdt):
    B = p_ref.shape[0]
    K, S = wc_ref.shape
    N = out_ref.shape[1]
    a = pl.program_id(1)
    tc, ts, pc, ps = _angle_tensors(pos_ref, shift_ref, spec_ref, a, N, K, L, cdt)

    p = p_ref[:, pl.ds(a, 1), :].reshape(B, S).astype(cdt)
    s_re = jnp.dot(p, wc_ref[...].T.astype(cdt), preferred_element_type=jnp.float32)
    s_im = -jnp.dot(p, ws_ref[...].T.astype(cdt), preferred_element_type=jnp.float32)
    pcf = pc[None].astype(jnp.float32)
    psf = ps[None].astype(jnp.float32)
    h_re = (s_re[:, None, :] * pcf + s_im[:, None, :] * psf).astype(cdt)   # (B, N, K)
    h_im = (-s_re[:, None, :] * psf + s_im[:, None, :] * pcf).astype(cdt)
    # f̃[b, row, other] += Σ_k h[b, row, k]·T̂[other, k] — contract K.
    # (For the y-group "row" is the x-axis; the caller transposes once at
    # the end — an in-kernel per-angle transpose measured 2× slower.)
    dn = (((2,), (1,)), ((), ()))
    contrib = lax.dot_general(h_re, tc, dn, preferred_element_type=jnp.float32)
    contrib = contrib + lax.dot_general(h_im, ts, dn, preferred_element_type=jnp.float32)

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def _pair_tensors(pos_ref, sha_ref, shb_ref, spec_ref, a, N, K, L, cdt):
    """Mirror-pair variant of :func:`_angle_tensors`: one shared splat T̂
    per pair plus both members' shear phases (geometry.py pair_group —
    member b's conjugation constant is folded into its shift row)."""
    fast = cdt == jnp.bfloat16
    ct, st = _row_trig(pos_ref, a, N, K, L, fast)
    spec = spec_ref[0, :][None, :]
    tc = (spec * ct).astype(cdt)                         # (N, K)
    ts = (-spec * st).astype(cdt)
    ca, sa = _row_trig(sha_ref, a, N, K, L, fast)
    cb, sb = _row_trig(shb_ref, a, N, K, L, fast)
    return (tc, ts,
            ca.astype(cdt), sa.astype(cdt),
            cb.astype(cdt), sb.astype(cdt))


def _fwd_pair_kernel(pos_ref, sha_ref, shb_ref, sgn_ref, spec_ref, wc_ref,
                     ws_ref, f_ref, out_ref, *, L: int, contract_x: bool, cdt):
    """One angle PAIR per grid step: the dominant stage-1 matmuls (ĝ = f·T̂)
    run once and serve both members — member b's spectrum is ±conj(ĝ) with
    its phase constant pre-folded into shb (geometry.py), so only the cheap
    VPU shear-reduce and the small stage-3 DFT matmul run twice."""
    B, N, _ = f_ref.shape
    K, S = wc_ref.shape
    a = pl.program_id(1)
    tc, ts, pca, psa, pcb, psb = _pair_tensors(
        pos_ref, sha_ref, shb_ref, spec_ref, a, N, K, L, cdt)
    f = f_ref[...].astype(cdt)
    cdim = 2 if contract_x else 1
    dn = (((cdim,), (0,)), ((), ()))
    gr = lax.dot_general(f, tc, dn, preferred_element_type=jnp.float32)
    gi = lax.dot_general(f, ts, dn, preferred_element_type=jnp.float32)
    wc = wc_ref[...].astype(cdt)
    ws = ws_ref[...].astype(cdt)

    def emit(pc, ps, gi_m, row):
        pcf = pc[None].astype(jnp.float32)
        psf = ps[None].astype(jnp.float32)
        s_re = (gr * pcf - gi_m * psf).sum(axis=1).astype(cdt)   # (B, K)
        s_im = (gr * psf + gi_m * pcf).sum(axis=1).astype(cdt)
        out = (jnp.dot(s_re, wc, preferred_element_type=jnp.float32)
               - jnp.dot(s_im, ws, preferred_element_type=jnp.float32))
        out_ref[:, pl.ds(row, 1), :] = out[:, None, :]

    emit(pca, psa, gi, 2 * a)
    # sgn/msk live in SMEM: dynamic per-pair *scalars* — a VMEM load would
    # need a lane index statically 128-aligned, and the loaded (1,1) tile
    # can't broadcast across both sublanes and lanes under Mosaic
    emit(pcb, psb, gi * sgn_ref[a], 2 * a + 1)


def _adj_pair_kernel(pos_ref, sha_ref, shb_ref, sgn_ref, msk_ref, spec_ref,
                     wc_ref, ws_ref, p_ref, out_ref,
                     *, L: int, contract_x: bool, cdt):
    """Exact transpose of :func:`_fwd_pair_kernel`: both members' cotangent
    rows fold into one shared spectral h, then ONE stage-1ᵀ matmul per pair
    accumulates the image. Invalid (unpaired) member-b rows are zeroed by
    the mask."""
    B = p_ref.shape[0]
    K, S = wc_ref.shape
    N = out_ref.shape[1]
    a = pl.program_id(1)
    tc, ts, pca, psa, pcb, psb = _pair_tensors(
        pos_ref, sha_ref, shb_ref, spec_ref, a, N, K, L, cdt)
    wcT = wc_ref[...].T.astype(cdt)
    wsT = ws_ref[...].T.astype(cdt)

    def member(pm, pc, ps):
        s_re = jnp.dot(pm, wcT, preferred_element_type=jnp.float32)
        s_im = -jnp.dot(pm, wsT, preferred_element_type=jnp.float32)
        pcf = pc[None].astype(jnp.float32)
        psf = ps[None].astype(jnp.float32)
        h_re = s_re[:, None, :] * pcf + s_im[:, None, :] * psf     # (B, N, K)
        h_im = -s_re[:, None, :] * psf + s_im[:, None, :] * pcf
        return h_re, h_im

    pa = p_ref[:, pl.ds(2 * a, 1), :].reshape(B, S).astype(cdt)
    # sgn/msk are dynamic per-pair SMEM scalars (see _fwd_pair_kernel)
    pb = (p_ref[:, pl.ds(2 * a + 1, 1), :].reshape(B, S) * msk_ref[a]).astype(cdt)
    h_re_a, h_im_a = member(pa, pca, psa)
    h_re_b, h_im_b = member(pb, pcb, psb)
    h_re = (h_re_a + h_re_b).astype(cdt)
    h_im = (h_im_a + sgn_ref[a] * h_im_b).astype(cdt)
    dn = (((2,), (1,)), ((), ()))
    contrib = lax.dot_general(h_re, tc, dn, preferred_element_type=jnp.float32)
    contrib = contrib + lax.dot_general(h_im, ts, dn, preferred_element_type=jnp.float32)

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def _batch_block(B: int, N: int, K: int, A_g: int, S: int) -> int:
    """Largest batch tile whose VMEM working set stays under the ~16 MB
    scoped limit. The per-batch-row live set is ≈ (2·N² [image/accum] +
    A_g·S [sino block] + 2·N·K [spectral re/im]) f32, plus a fixed
    (4·N·K angle tensors + 2·K·S DFT matrices + 2·A_g·N plan rows). The
    model slightly overestimates the compiler's measured stack (buffer
    reuse): dense-512-spoke plan at K=389/bb=8 modeled 20.9 MB vs 18.95
    real (OOM > 16), sparse-radial K=384/bb=8 modeled ≈ 13.8 (runs). A
    17 MB modeled threshold splits every observed pass/fail pair with
    margin, keeping the flagship parallel plan (~6.6 MB) and sparse
    radial at bb=8 while dropping the dense synthesis plan to bb=4."""
    fixed = (4 * N * K + 2 * K * S + 2 * A_g * N) * 4
    per = (2 * N * N + A_g * S + 2 * N * K) * 4
    for cand in (8, 4, 2, 1):
        if B % cand == 0 and fixed + cand * per <= 17_000_000:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("L", "contract_x", "interpret", "bf16"))
def project_group_pallas(f, pos, shift, spec, Wc, Ws, L, contract_x,
                         interpret=False, bf16=False):
    """Fused forward for one angle group: f (B,N,N) → (B, A_g, S)."""
    B, N, _ = f.shape
    A_g = pos.shape[0]
    K, S = Wc.shape
    bb = _batch_block(B, N, K, A_g, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(_fwd_kernel, L=L, contract_x=contract_x, cdt=cdt)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, a: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, A_g, S), jnp.float32),
        grid=(B // bb, A_g),
        in_specs=[
            full2(pos), full2(shift), full2(spec[None, :]),
            full2(Wc), full2(Ws),
            pl.BlockSpec((bb, N, N), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, A_g, S), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pos, shift, spec[None, :], Wc, Ws, f)


@functools.partial(jax.jit, static_argnames=("L", "contract_x", "N", "interpret", "bf16"))
def backproject_group_pallas(p, pos, shift, spec, Wc, Ws, L, contract_x, N,
                             interpret=False, bf16=False):
    """Fused adjoint for one angle group: p (B, A_g, S) → (B, N, N)."""
    B, A_g, S = p.shape
    K = Wc.shape[0]
    bb = _batch_block(B, N, K, A_g, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(_adj_kernel, L=L, contract_x=contract_x, cdt=cdt)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, a: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        grid=(B // bb, A_g),
        in_specs=[
            full2(pos), full2(shift), full2(spec[None, :]),
            full2(Wc), full2(Ws),
            pl.BlockSpec((bb, A_g, S), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, N, N), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pos, shift, spec[None, :], Wc, Ws, p)
    return out if contract_x else out.transpose(0, 2, 1)


def _pair_batch_block(B: int, N: int, K: int, P: int, S: int) -> int:
    """VMEM batch-tile model for the pair kernels (same 17 MB budget as
    :func:`_batch_block`): vs the per-angle kernels the fixed set adds two
    more (N, K) phase tensors and a third (P, N) plan row block; the
    per-batch-row set swaps the A_g·S sinogram block for 2P·S (≈ equal)."""
    fixed = (8 * N * K + 2 * K * S + 3 * P * N) * 4
    per = (2 * N * N + 2 * P * S + 2 * N * K) * 4
    for cand in (8, 4, 2, 1):
        if B % cand == 0 and fixed + cand * per <= 17_000_000:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("L", "contract_x", "interpret", "bf16"))
def project_pair_group_pallas(f, pos, sha, shb, sgn, spec, Wc, Ws, L,
                              contract_x, interpret=False, bf16=False):
    """Fused mirror-pair forward for one angle group:
    f (B,N,N) → (B, 2P, S), rows interleaved [pair0-a, pair0-b, ...].
    jnp twin: ops/radon/parallel.py::_project_pair_group."""
    B, N, _ = f.shape
    P = pos.shape[0]
    K, S = Wc.shape
    bb = _pair_batch_block(B, N, K, P, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(_fwd_pair_kernel, L=L, contract_x=contract_x, cdt=cdt)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, a: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 2 * P, S), jnp.float32),
        grid=(B // bb, P),
        in_specs=[
            full2(pos), full2(sha), full2(shb),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full2(spec[None, :]), full2(Wc), full2(Ws),
            pl.BlockSpec((bb, N, N), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, 2 * P, S), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pos, sha, shb, sgn, spec[None, :], Wc, Ws, f)


@functools.partial(jax.jit, static_argnames=("L", "contract_x", "N", "interpret", "bf16"))
def backproject_pair_group_pallas(p, pos, sha, shb, sgn, msk, spec, Wc, Ws,
                                  L, contract_x, N, interpret=False, bf16=False):
    """Fused mirror-pair adjoint for one angle group:
    p (B, 2P, S) interleaved → (B, N, N).
    jnp twin: ops/radon/parallel.py::_backproject_pair_group."""
    B, twoP, S = p.shape
    P = twoP // 2
    K = Wc.shape[0]
    bb = _pair_batch_block(B, N, K, P, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(_adj_pair_kernel, L=L, contract_x=contract_x, cdt=cdt)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, a: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        grid=(B // bb, P),
        in_specs=[
            full2(pos), full2(sha), full2(shb),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full2(spec[None, :]), full2(Wc), full2(Ws),
            pl.BlockSpec((bb, 2 * P, S), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, N, N), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pos, sha, shb, sgn, msk, spec[None, :], Wc, Ws, p)
    return out if contract_x else out.transpose(0, 2, 1)