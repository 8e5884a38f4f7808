"""Prototype A/B: lane-packed re/im Pallas projector kernels vs shipped.

The shipped kernels issue separate re/im matmuls per angle; with the
flagship plan's K=180 each output pads to 256 MXU lanes (2x256=512 lane
columns of work). Packing [tc|ts] along lanes makes stage 1 one matmul of
2K=360 -> 384 padded lanes (25% less MXU work), and the stage-2 phase fold
can feed stage 3 as a single (b,4K)x(4K,S) matmul.

Run on the TPU (exclusive): python scripts/pack_proto.py
Run on CPU (interpret-mode correctness only): python scripts/pack_proto.py --cpu
(the JAX_PLATFORMS env var is clobbered by the axon sitecustomize — only
the --cpu flag / jax.config.update reliably forces CPU here)

MEASURED RESULT (2026-08-18, v5e, flagship plan K=180 S=256 bf16 batch 32):
fwd packed 0.90x (SLOWER), adj packed 1.01x (wash). The kernels are not
MXU-lane-bound at these shapes — the VPU trig/phase generation and the
shear-reduce dominate, so cutting stage-1 lane padding 512->384 buys
nothing while the wider (B, rows, 2K) intermediate costs VMEM bandwidth.
Kept as a prototype + negative result; do NOT integrate. The win that did
land instead is the mirror-pair factorization (pallas_kernels.py), which
removes half the stage-1 matmuls outright rather than shaving their
padding.
"""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from pdunet_tpu.geometry import ParallelGeometry, build_parallel_plan
from pdunet_tpu.ops.radon.pallas_kernels import (
    _angle_tensors, _batch_block, project_group_pallas,
    backproject_group_pallas,
)


def _fwd_kernel_packed(pos_ref, shift_ref, spec_ref, wc_ref, ws_ref, f_ref,
                       out_ref, *, L: int, contract_x: bool, cdt):
    B, N, _ = f_ref.shape
    K, S = wc_ref.shape
    a = pl.program_id(1)
    tc, ts, pc, ps = _angle_tensors(pos_ref, shift_ref, spec_ref, a, N, K, L, cdt)
    f = f_ref[...].astype(cdt)
    tcs = jnp.concatenate([tc, ts], axis=1)                  # (N, 2K)
    cdim = 2 if contract_x else 1
    dn = (((cdim,), (0,)), ((), ()))
    g = lax.dot_general(f, tcs, dn, preferred_element_type=jnp.float32)
    # g: (B, rows, 2K); halves are gr | gi
    p1 = jnp.concatenate([pc, -ps], axis=1)[None].astype(jnp.float32)
    p2 = jnp.concatenate([ps, pc], axis=1)[None].astype(jnp.float32)
    row1 = (g * p1).sum(axis=1).astype(cdt)                   # (B, 2K)
    row2 = (g * p2).sum(axis=1).astype(cdt)
    rows = jnp.concatenate([row1, row2], axis=1)              # (B, 4K)
    wc = wc_ref[...].astype(cdt)
    ws = ws_ref[...].astype(cdt)
    w4 = jnp.concatenate([wc, wc, -ws, -ws], axis=0)          # (4K, S)
    out = jnp.dot(rows, w4, preferred_element_type=jnp.float32)
    out_ref[:, pl.ds(a, 1), :] = out[:, None, :]


def _adj_kernel_packed(pos_ref, shift_ref, spec_ref, wc_ref, ws_ref, p_ref,
                       out_ref, *, L: int, contract_x: bool, cdt):
    B = p_ref.shape[0]
    K, S = wc_ref.shape
    N = out_ref.shape[1]
    a = pl.program_id(1)
    tc, ts, pc, ps = _angle_tensors(pos_ref, shift_ref, spec_ref, a, N, K, L, cdt)

    p = p_ref[:, pl.ds(a, 1), :].reshape(B, S).astype(cdt)
    # stage 1 stays two small dots (B x S x K each — negligible flops)
    s_re = jnp.dot(p, wc_ref[...].T.astype(cdt), preferred_element_type=jnp.float32)
    s_im = -jnp.dot(p, ws_ref[...].T.astype(cdt), preferred_element_type=jnp.float32)
    pcf = pc[None].astype(jnp.float32)
    psf = ps[None].astype(jnp.float32)
    h_re = (s_re[:, None, :] * pcf + s_im[:, None, :] * psf)   # (B, N, K)
    h_im = (-s_re[:, None, :] * psf + s_im[:, None, :] * pcf)
    # packed big dot: contract 2K (360 -> 384 padded) once instead of two
    # K (180 -> 256 padded) dots: h_re.tc + h_im.ts
    h = jnp.concatenate([h_re, h_im], axis=2).astype(cdt)      # (B, N, 2K)
    t2 = jnp.concatenate([tc, ts], axis=1)                     # (N, 2K)
    dn = (((2,), (1,)), ((), ()))
    contrib = lax.dot_general(h, t2, dn, preferred_element_type=jnp.float32)

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def call_fwd(kern_fn, f, pos, shift, spec, Wc, Ws, L, contract_x, bf16,
             interpret=False):
    B, N, _ = f.shape
    A_g = pos.shape[0]
    K, S = Wc.shape
    bb = _batch_block(B, N, K, A_g, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(kern_fn, L=L, contract_x=contract_x, cdt=cdt)
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
        out_specs=pl.BlockSpec((bb, A_g, S), lambda b, a: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pos, shift, spec[None, :], Wc, Ws, f)


def call_adj(kern_fn, p, pos, shift, spec, Wc, Ws, L, contract_x, N, bf16,
             interpret=False):
    B, A_g, S = p.shape
    K = Wc.shape[0]
    bb = _batch_block(B, N, K, A_g, S)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kern = functools.partial(kern_fn, L=L, contract_x=contract_x, cdt=cdt)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, a: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        grid=(B // bb, A_g),
        in_specs=[
            full2(pos), full2(shift), full2(spec[None, :]),
            full2(Wc), full2(Ws),
            pl.BlockSpec((bb, A_g, S), lambda b, a: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, N, N), lambda b, a: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pos, shift, spec[None, :], Wc, Ws, p)


def main():
    if "--cpu" in sys.argv:
        # env-var forcing is clobbered by the axon sitecustomize; the config
        # update is the only reliable way (same trick as conftest.py)
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() != "tpu"
    geom = ParallelGeometry(image_size=256, n_angles=360).subsample(4)
    plan = build_parallel_plan(geom, dtype=jnp.bfloat16)
    meta = plan.meta
    L = meta["S_ext"]
    print(f"plan: K={meta['K']} S={meta['S']} S_ext={L} A_x={meta['A_x']} A_y={meta['A_y']}")
    B = 32
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (B, 256, 256), jnp.float32)

    for bf16 in (True,):
        # forward x-group
        args = (plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws, L, True, bf16)
        ref = np.asarray(call_fwd(
            functools.partial(__import__("pdunet_tpu.ops.radon.pallas_kernels",
                                         fromlist=["x"])._fwd_kernel),
            f, *args, interpret=interpret))
        new = np.asarray(call_fwd(_fwd_kernel_packed, f, *args, interpret=interpret))
        err = np.abs(ref - new).max() / (np.abs(ref).max() + 1e-9)
        print(f"fwd packed rel-err (bf16={bf16}): {err:.3e}")
        assert err < 2e-2 if bf16 else err < 1e-5

        A_g = plan.pos_x.shape[0]
        p = jax.random.normal(key, (B, A_g, meta["S"]), jnp.float32)
        argsa = (plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws, L, True,
                 256, bf16)
        refa = np.asarray(call_adj(
            functools.partial(__import__("pdunet_tpu.ops.radon.pallas_kernels",
                                         fromlist=["x"])._adj_kernel),
            p, *argsa, interpret=interpret))
        newa = np.asarray(call_adj(_adj_kernel_packed, p, *argsa, interpret=interpret))
        erra = np.abs(refa - newa).max() / (np.abs(refa).max() + 1e-9)
        print(f"adj packed rel-err (bf16={bf16}): {erra:.3e}")
        assert erra < (2e-2 if bf16 else 1e-5)

    if interpret:
        print("CPU interpret-mode correctness done (no timing).")
        return

    # timing on-chip: bench.timeit does device-honest on-device repetition
    # (axon's block_until_ready returns at dispatch, not completion)
    from bench import timeit
    from pdunet_tpu.ops.radon import pallas_kernels as pk

    fwd_old = lambda x: call_fwd(pk._fwd_kernel, x, *args)
    fwd_new = lambda x: call_fwd(_fwd_kernel_packed, x, *args)
    t_fo = timeit(fwd_old, f, iters=50)
    t_fn = timeit(fwd_new, f, iters=50)
    print(f"fwd old {t_fo*1e3:.3f} ms  new {t_fn*1e3:.3f} ms  ({t_fo/t_fn:.2f}x)")
    adj_old = lambda x: call_adj(pk._adj_kernel, x, *argsa)
    adj_new = lambda x: call_adj(_adj_kernel_packed, x, *argsa)
    t_ao = timeit(adj_old, p, iters=50)
    t_an = timeit(adj_new, p, iters=50)
    print(f"adj old {t_ao*1e3:.3f} ms  new {t_an*1e3:.3f} ms  ({t_ao/t_an:.2f}x)")


if __name__ == "__main__":
    main()
