"""Probe: is the fused pair projector kernel VPU-trig-bound?

The pair kernels regenerate six (N, K) trig tensors per angle pair
(_pair_tensors). MXU util of the fwd kernel is ~20% (bench roofline), so
something else dominates. This A/Bs three fwd variants at the flagship
plan shape:

  A. shipped  — full trig generation (baseline)
  B. no-trig  — phase tensors replaced by cheap mul-adds (same shapes,
                same matmuls; bounds the achievable win if trig were free)
  C. doubling — trig seeded on the first row only, remaining rows built by
                log2(N) block-doubling complex multiplies (exact identity
                e^{i(a+b)} = e^{ia}e^{ib}; error ~N·eps_f32 ≈ 3e-5)

and the matching adjoint variants. If B ≈ A, trig is NOT the bottleneck
and variant C is pointless; if B ≪ A, C shows how much of the gap the
doubling scheme recovers.

Run on the TPU (exclusive): python scripts/trig_proto.py
CPU correctness only:       python scripts/trig_proto.py --cpu
"""

from __future__ import annotations

import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from pdunet_tpu.geometry import ParallelGeometry, build_parallel_plan
from pdunet_tpu.ops.radon.pallas_kernels import (
    _fwd_pair_kernel,
    _pair_batch_block,
)


def _fwd_pair_kernel_notrig(pos_ref, sha_ref, shb_ref, sgn_ref, spec_ref,
                            wc_ref, ws_ref, f_ref, out_ref,
                            *, L: int, contract_x: bool, cdt):
    """Same dataflow as _fwd_pair_kernel with the six trig tensors replaced
    by mul-adds of the same shape (wrong numerics, right cost profile)."""
    B, N, _ = f_ref.shape
    K, S = wc_ref.shape
    a = pl.program_id(1)
    k = (2.0 * math.pi / L) * lax.broadcasted_iota(
        jnp.int32, (N, K), 1).astype(jnp.float32)
    pos = pos_ref[pl.ds(a, 1), :].reshape(N, 1)
    spec = spec_ref[0, :][None, :]
    tc = (spec + pos * k).astype(cdt)
    ts = (spec - pos * k).astype(cdt)
    sa = sha_ref[pl.ds(a, 1), :].reshape(N, 1)
    sb = shb_ref[pl.ds(a, 1), :].reshape(N, 1)
    pca = (sa * k + 1.0).astype(cdt)
    psa = (sa * k - 1.0).astype(cdt)
    pcb = (sb * k + 1.0).astype(cdt)
    psb = (sb * k - 1.0).astype(cdt)
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
        s_re = (gr * pcf - gi_m * psf).sum(axis=1).astype(cdt)
        s_im = (gr * psf + gi_m * pcf).sum(axis=1).astype(cdt)
        out = (jnp.dot(s_re, wc, preferred_element_type=jnp.float32)
               - jnp.dot(s_im, ws, preferred_element_type=jnp.float32))
        out_ref[:, pl.ds(row, 1), :] = out[:, None, :]

    emit(pca, psa, gi, 2 * a)
    emit(pcb, psb, gi * sgn_ref[a], 2 * a + 1)


def _doubling_phase(theta_row0, step_row, N):
    """Rows of e^{i·theta(j,k)} for theta(j,k) = theta0(k) + j·step(k),
    built by log2(N) block-doubling complex multiplies.

    theta_row0: (1, K) phase of row 0; step_row: (1, K) per-row increment.
    Returns (cos, sin) of shape (N, K)."""
    c = jnp.cos(theta_row0)
    s = jnp.sin(theta_row0)
    # rotor for the current block size (starts at 1 row)
    rc = jnp.cos(step_row)
    rs = jnp.sin(step_row)
    n = 1
    while n < N:
        # rows [n, 2n) = rows [0, n) rotated by the block rotor
        c2 = c * rc - s * rs
        s2 = c * rs + s * rc
        c = jnp.concatenate([c, c2], axis=0)
        s = jnp.concatenate([s, s2], axis=0)
        # square the rotor: block size doubles
        rc, rs = rc * rc - rs * rs, 2.0 * rc * rs
        n *= 2
    return c[:N], s[:N]


def _fwd_pair_kernel_doubling(pos_ref, sha_ref, shb_ref, sgn_ref, spec_ref,
                              wc_ref, ws_ref, f_ref, row0_ref, step_ref,
                              out_ref, *, L: int, contract_x: bool, cdt):
    """Shipped pair kernel with all six trig tensors built by block-doubling
    from per-angle (row0, step) rows: row0_ref/step_ref are (P, 6K) packed
    [pos | sha | shb] phase seeds (theta at j=0 and per-row increment)."""
    B, N, _ = f_ref.shape
    K, S = wc_ref.shape
    a = pl.program_id(1)
    seeds0 = row0_ref[pl.ds(a, 1), :]            # (1, 6K) -> 3 phase families
    steps = step_ref[pl.ds(a, 1), :]
    spec = spec_ref[0, :][None, :]

    tc_c, tc_s = _doubling_phase(seeds0[:, :K], steps[:, :K], N)
    tc = (spec * tc_c).astype(cdt)
    ts = (-spec * tc_s).astype(cdt)
    pca, psa = _doubling_phase(seeds0[:, K:2 * K], steps[:, K:2 * K], N)
    pcb, psb = _doubling_phase(seeds0[:, 2 * K:3 * K], steps[:, 2 * K:3 * K], N)

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
        s_re = (gr * pcf - gi_m * psf).sum(axis=1).astype(cdt)
        s_im = (gr * psf + gi_m * pcf).sum(axis=1).astype(cdt)
        out = (jnp.dot(s_re, wc, preferred_element_type=jnp.float32)
               - jnp.dot(s_im, ws, preferred_element_type=jnp.float32))
        out_ref[:, pl.ds(row, 1), :] = out[:, None, :]

    emit(pca.astype(cdt), psa.astype(cdt), gi, 2 * a)
    emit(pcb.astype(cdt), psb.astype(cdt), gi * sgn_ref[a], 2 * a + 1)


def _phase_seeds(plan, grp, K, L):
    """Host-side (P, 6K) packed phase seeds for the doubling kernel.

    theta_t(j,k) = pos[j]·k·2π/L  — pos linear in j (pixel centers), so
    theta at row 0 and the per-row increment fully describe it; same for
    the two shear families."""
    pos = np.asarray(getattr(plan, f"pair_pos_{grp}"))
    sha = np.asarray(getattr(plan, f"pair_sha_{grp}"))
    shb = np.asarray(getattr(plan, f"pair_shb_{grp}"))
    k = np.arange(K) * (2.0 * np.pi / L)
    def fam(rows):
        row0 = rows[:, 0:1] * k[None, :]
        step = (rows[:, 1:2] - rows[:, 0:1]) * k[None, :]
        return row0, step
    r0s, sts = zip(fam(pos), fam(sha), fam(shb))
    return (np.concatenate(r0s, axis=1).astype(np.float32),
            np.concatenate(sts, axis=1).astype(np.float32))


def call_pair_fwd(kern_fn, f, plan, grp, contract_x, bf16, interpret=False,
                  extra=None):
    pos = getattr(plan, f"pair_pos_{grp}")
    sha = getattr(plan, f"pair_sha_{grp}")
    shb = getattr(plan, f"pair_shb_{grp}")
    sgn = getattr(plan, f"pair_sgn_{grp}")
    spec, Wc, Ws = plan.spec, plan.Wc, plan.Ws
    L = plan.meta["S_ext"]
    B, N, _ = f.shape
    P = pos.shape[0]
    K, S = Wc.shape
    bb = _pair_batch_block(B, N, K, P, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(kern_fn, L=L, contract_x=contract_x, cdt=cdt)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, a: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    in_specs = [
        full2(pos), full2(sha), full2(shb),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        full2(spec[None, :]), full2(Wc), full2(Ws),
        pl.BlockSpec((bb, N, N), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [pos, sha, shb, sgn, spec[None, :], Wc, Ws, f]
    if extra is not None:
        for arr in extra:
            in_specs.append(full2(arr))
            args.append(arr)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 2 * P, S), jnp.float32),
        grid=(B // bb, P),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 2 * P, S), lambda b, a: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() != "tpu"
    geom = ParallelGeometry(image_size=256, n_angles=360).subsample(4)
    plan = build_parallel_plan(geom, dtype=jnp.bfloat16)
    meta = plan.meta
    K, L = meta["K"], meta["S_ext"]
    print(f"plan: K={K} S={meta['S']} S_ext={L} P_x={meta['P_x']} P_y={meta['P_y']}")
    B = 32
    f = jax.random.normal(jax.random.PRNGKey(0), (B, 256, 256), jnp.float32)
    bf16 = True

    base = np.asarray(call_pair_fwd(_fwd_pair_kernel, f, plan, "x", True,
                                    bf16, interpret=interpret))
    seeds = _phase_seeds(plan, "x", K, L)
    seeds = tuple(jnp.asarray(s) for s in seeds)
    dbl = np.asarray(call_pair_fwd(_fwd_pair_kernel_doubling, f, plan, "x",
                                   True, bf16, interpret=interpret,
                                   extra=seeds))
    err = np.abs(dbl - base).max() / (np.abs(base).max() + 1e-9)
    print(f"doubling vs shipped rel-err: {err:.3e}")
    assert err < 2e-2

    if interpret:
        print("CPU correctness done (no timing).")
        return

    from bench import timeit

    t_a = timeit(lambda x: call_pair_fwd(_fwd_pair_kernel, x, plan, "x",
                                         True, bf16), f, iters=50)
    t_b = timeit(lambda x: call_pair_fwd(_fwd_pair_kernel_notrig, x, plan,
                                         "x", True, bf16), f, iters=50)
    t_c = timeit(lambda x: call_pair_fwd(_fwd_pair_kernel_doubling, x, plan,
                                         "x", True, bf16, extra=seeds),
                 f, iters=50)
    print(f"fwd shipped  {t_a*1e3:.3f} ms")
    print(f"fwd no-trig  {t_b*1e3:.3f} ms  ({t_a/t_b:.2f}x bound)")
    print(f"fwd doubling {t_c*1e3:.3f} ms  ({t_a/t_c:.2f}x)")


if __name__ == "__main__":
    main()
