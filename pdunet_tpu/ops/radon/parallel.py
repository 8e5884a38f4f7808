"""Parallel-beam Radon forward / adjoint, TPU-native.

Replaces torch-radon's parallel-beam CUDA projectors (SURVEY.md §2b C1, §2c).
Two implementations:

* ``parallel_project`` / ``parallel_backproject`` — the production path: the
  factored matmul + grouped-conv pipeline described in
  :mod:`pdunet_tpu.geometry`. All FLOPs land on the MXU with static
  precomputed weights; no gathers, no scatters, no dynamic shapes. The pair
  is an exact transpose (machine-precision adjoint test).

* ``parallel_project_ref`` — a slow, simple ray-driven sampler (the numerical
  oracle; SURVEY.md §4.2 tier 1/3). Its exact adjoint is available through
  ``jax.linear_transpose`` for cross-checking.

Shapes: images ``(..., N, N)`` (row index j ↦ +y, column index i ↦ +x),
sinograms ``(..., A, S)``.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pdunet_tpu.geometry import ParallelGeometry, ParallelPlan, build_parallel_plan

__all__ = [
    "parallel_project",
    "parallel_backproject",
    "parallel_project_ref",
    "make_parallel_ops",
    "RadonOps",
]


# ---------------------------------------------------------------------------
# Production factored path
# ---------------------------------------------------------------------------


def _collapse_batch(x: jnp.ndarray, ndim_event: int):
    """Flatten all leading dims into one batch dim; return (x3, restore_fn)."""
    batch_shape = x.shape[: x.ndim - ndim_event]
    event_shape = x.shape[x.ndim - ndim_event:]
    xb = x.reshape((-1,) + event_shape)

    def restore(y: jnp.ndarray) -> jnp.ndarray:
        return y.reshape(batch_shape + y.shape[1:])

    return xb, restore


_CDT = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _ein(sub, *ops):
    return jnp.einsum(sub, *ops, preferred_element_type=jnp.float32)


def _spectral_tensors(pos, shift, spec, L, cdt=jnp.float32):
    """Generate the (A_g, N, K) spectral tensors on the fly (VPU trig over
    outer products of compact plan arrays — see geometry.build_parallel_plan).

    T̂ = spec·e^{−2πik·pos/L} (splat), φ = e^{+2πik·shift/L} (shear phase).
    Trig runs in f32 (arguments span hundreds of radians); the results are
    cast to ``cdt`` for the matmuls (bf16 → one MXU pass instead of three).
    """
    K = spec.shape[0]
    k = jnp.arange(K, dtype=pos.dtype) * (2.0 * jnp.pi / L)
    ang_t = pos[:, :, None] * k[None, None, :]
    Tc = (spec * jnp.cos(ang_t)).astype(cdt)
    Ts = (-spec * jnp.sin(ang_t)).astype(cdt)
    ang_p = shift[:, :, None] * k[None, None, :]
    return Tc, Ts, jnp.cos(ang_p).astype(cdt), jnp.sin(ang_p).astype(cdt)


def _project_group(f, pos, shift, spec, Wc, Ws, L, contract_x: bool,
                   cdt=jnp.float32):
    """One angle group of the DFT-domain pipeline: f (B,N,N) → p (B,A_g,S).

    ĝ = f·T̂ (stage-1 splat, directly in frequency space; MXU matmul) →
    Ŝ = Σ_rows ĝ·φ (spectral shear-sum; elementwise + reduction) →
    p = Re(Ŝ·W) (inverse DFT as a matmul).

    ``contract_x``: True contracts the image x-axis (x-primary group, rows
    indexed by j); False contracts the y-axis (rows indexed by i).
    """
    Tc, Ts, Pc, Ps = _spectral_tensors(pos, shift, spec, L, cdt)
    f = f.astype(cdt)
    Wc, Ws = Wc.astype(cdt), Ws.astype(cdt)
    sub1 = "bji,aik->bajk" if contract_x else "bji,ajk->baik"
    gr = _ein(sub1, f, Tc)
    gi = _ein(sub1, f, Ts)
    sub2 = "bajk,ajk->bak" if contract_x else "baik,aik->bak"
    s_re = _ein(sub2, gr, Pc) - _ein(sub2, gi, Ps)
    s_im = _ein(sub2, gr, Ps) + _ein(sub2, gi, Pc)
    return (_ein("bak,ks->bas", s_re.astype(cdt), Wc)
            - _ein("bak,ks->bas", s_im.astype(cdt), Ws))


def _backproject_group(p, pos, shift, spec, Wc, Ws, L, contract_x: bool,
                       cdt=jnp.float32):
    """Exact transpose of :func:`_project_group`: p (B,A_g,S) → f̃ (B,N,N)."""
    Tc, Ts, Pc, Ps = _spectral_tensors(pos, shift, spec, L, cdt)
    p = p.astype(cdt)
    Wc, Ws = Wc.astype(cdt), Ws.astype(cdt)
    s_re = _ein("bas,ks->bak", p, Wc)
    s_im = -_ein("bas,ks->bak", p, Ws)
    sub2t = "bak,ajk->bajk" if contract_x else "bak,aik->baik"
    s_re, s_im = s_re.astype(cdt), s_im.astype(cdt)
    h_re = _ein(sub2t, s_re, Pc) + _ein(sub2t, s_im, Ps)
    h_im = -_ein(sub2t, s_re, Ps) + _ein(sub2t, s_im, Pc)
    sub1t = "bajk,aik->bji" if contract_x else "baik,ajk->bji"
    return (_ein(sub1t, h_re.astype(cdt), Tc)
            + _ein(sub1t, h_im.astype(cdt), Ts))


def _pair_spectral_tensors(pos, sha, shb, spec, L, cdt=jnp.float32):
    """Spectral tensors for the mirror-pair path (see geometry.py's
    pair_group): one shared splat T̂ per pair plus BOTH members' shear
    phases. Member b's conjugation constant is already folded into ``shb``."""
    K = spec.shape[0]
    k = jnp.arange(K, dtype=pos.dtype) * (2.0 * jnp.pi / L)
    ang_t = pos[:, :, None] * k[None, None, :]
    Tc = (spec * jnp.cos(ang_t)).astype(cdt)
    Ts = (-spec * jnp.sin(ang_t)).astype(cdt)
    ang_a = sha[:, :, None] * k[None, None, :]
    ang_b = shb[:, :, None] * k[None, None, :]
    return (Tc, Ts,
            jnp.cos(ang_a).astype(cdt), jnp.sin(ang_a).astype(cdt),
            jnp.cos(ang_b).astype(cdt), jnp.sin(ang_b).astype(cdt))


def _project_pair_group(f, pos, sha, shb, sgn, spec, Wc, Ws, L,
                        contract_x: bool, cdt=jnp.float32):
    """Mirror-pair twin of :func:`_project_group`: ONE stage-1 matmul per
    angle PAIR (ĝ shared; member b reuses it conjugated via ``sgn``), then
    each member applies its own shear phases. f (B,N,N) → (B, 2P, S) with
    rows interleaved [pair0-a, pair0-b, pair1-a, ...]."""
    Tc, Ts, PcA, PsA, PcB, PsB = _pair_spectral_tensors(pos, sha, shb, spec, L, cdt)
    f = f.astype(cdt)
    Wc, Ws = Wc.astype(cdt), Ws.astype(cdt)
    sub1 = "bji,pik->bpjk" if contract_x else "bji,pjk->bpik"
    gr = _ein(sub1, f, Tc)
    gi = _ein(sub1, f, Ts)
    sub2 = "bpjk,pjk->bpk" if contract_x else "bpik,pik->bpk"

    def member(Pc, Ps, gi_m):
        s_re = _ein(sub2, gr, Pc) - _ein(sub2, gi_m, Ps)
        s_im = _ein(sub2, gr, Ps) + _ein(sub2, gi_m, Pc)
        return (_ein("bpk,ks->bps", s_re.astype(cdt), Wc)
                - _ein("bpk,ks->bps", s_im.astype(cdt), Ws))

    out_a = member(PcA, PsA, gi)
    out_b = member(PcB, PsB, gi * sgn[None, :, None, None])
    out = jnp.stack([out_a, out_b], axis=2)          # (B, P, 2, S)
    return out.reshape(out.shape[0], -1, out.shape[-1])


def _backproject_pair_group(p, pos, sha, shb, sgn, msk, spec, Wc, Ws, L,
                            contract_x: bool, cdt=jnp.float32):
    """Exact transpose of :func:`_project_pair_group`:
    p (B, 2P, S) interleaved → f̃ (B,N,N), one stage-1ᵀ matmul per pair."""
    Tc, Ts, PcA, PsA, PcB, PsB = _pair_spectral_tensors(pos, sha, shb, spec, L, cdt)
    p = p.astype(cdt)
    Wc, Ws = Wc.astype(cdt), Ws.astype(cdt)
    B, twoP, S = p.shape
    pp = p.reshape(B, twoP // 2, 2, S)
    pa = pp[:, :, 0]
    pb = pp[:, :, 1] * msk[None, :, None]
    sub2t = "bpk,pjk->bpjk" if contract_x else "bpk,pik->bpik"

    def member(pm, Pc, Ps):
        s_re = _ein("bps,ks->bpk", pm, Wc).astype(cdt)
        s_im = (-_ein("bps,ks->bpk", pm, Ws)).astype(cdt)
        h_re = _ein(sub2t, s_re, Pc) + _ein(sub2t, s_im, Ps)
        h_im = -_ein(sub2t, s_re, Ps) + _ein(sub2t, s_im, Pc)
        return h_re, h_im

    h_re_a, h_im_a = member(pa, PcA, PsA)
    h_re_b, h_im_b = member(pb, PcB, PsB)
    h_re = h_re_a + h_re_b
    h_im = h_im_a + sgn[None, :, None, None] * h_im_b
    sub1t = "bpjk,pik->bji" if contract_x else "bpik,pjk->bji"
    return (_ein(sub1t, h_re.astype(cdt), Tc)
            + _ein(sub1t, h_im.astype(cdt), Ts))


def make_batch_padder(mesh, batch_axis):
    """shard_map needs the leading batch divisible by the data axis; pad
    with zero slices (model.init traces with batch 1, eval batches may be
    ragged) and let the caller slice the pad back off after."""
    D = mesh.shape[batch_axis] if batch_axis else 1

    def pad_batch(xb):
        pad = (-xb.shape[0]) % D
        if pad:
            xb = jnp.concatenate(
                [xb, jnp.zeros((pad,) + xb.shape[1:], xb.dtype)], axis=0
            )
        return xb, pad

    return pad_batch


def padded_batch_caller(mesh=None, batch_axis=None):
    """The one pad/call/unpad wrapper every sharded operator bundle uses:
    ``through(fn, x)`` collapses all leading dims into one batch dim, pads
    it up to the mesh's batch-axis size (no-op without a mesh), calls
    ``fn`` on the padded (B, *event) array, slices the pad back off, and
    restores the leading dims. Shared by the parallel, fan, and NUFFT
    bundles so the padding contract lives in exactly one place."""
    pad_batch = make_batch_padder(mesh, batch_axis) if mesh is not None else None

    def through(fn, x, ndim_event: int = 2):
        xb, restore = _collapse_batch(x, ndim_event)
        pad = 0
        if pad_batch is not None:
            xb, pad = pad_batch(xb)
        out = fn(xb)
        return restore(out[: out.shape[0] - pad] if pad else out)

    return through


# 'auto' uses the fused Pallas kernels on TPU and the einsum pipeline (the
# jnp twin, SURVEY.md §4.2 tier 4) elsewhere. Overridable per call or
# globally (set_default_impl) for A/B benchmarking.
_DEFAULT_IMPL = "auto"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("auto", "einsum", "pallas"):
        raise ValueError(f"impl must be auto|einsum|pallas, got {impl!r}")
    _DEFAULT_IMPL = impl


def _resolve_impl(impl):
    impl = impl or _DEFAULT_IMPL
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "einsum"
    return impl


def parallel_project(plan: ParallelPlan, image: jnp.ndarray, impl: str = None,
                     mesh=None, angle_axis: str = "angle",
                     batch_axis: str = None, interpret: bool = False) -> jnp.ndarray:
    """Factored parallel-beam forward projection. image (..., N, N) → (..., A, S).

    ``mesh``: shard the angle axis over ``angle_axis`` of the mesh
    (parallel/angle_shard.py) — the per-shard bodies still honor ``impl``.
    The fan and NUFFT operators compose through this entry point, so one
    mesh argument angle-shards all three modalities."""
    if mesh is not None:
        from pdunet_tpu.parallel.angle_shard import angle_sharded_project

        f, restore = _collapse_batch(image, 2)
        return restore(angle_sharded_project(
            plan, f, mesh, angle_axis, batch_axis, impl))
    meta = plan.meta
    L = meta["S_ext"]
    cdt = _CDT[meta.get("compute_dtype", "float32")]
    f, restore = _collapse_batch(image, 2)
    f = f.astype(jnp.float32)
    if _resolve_impl(impl) == "pallas":
        from pdunet_tpu.ops.radon.pallas_kernels import (
            project_group_pallas,
            project_pair_group_pallas,
        )

        if meta.get("use_pairs"):
            # Mirror-pair fast path: stage-1 matmuls shared across angle
            # pairs (geometry.py pair_group) — ~2× fewer projector FLOPs
            # on uniform scans. Outputs reassemble via the pair perm.
            bf = cdt == jnp.bfloat16
            parts = []
            if meta["P_x"]:
                parts.append(project_pair_group_pallas(
                    f, plan.pair_pos_x, plan.pair_sha_x, plan.pair_shb_x,
                    plan.pair_sgn_x, plan.spec, plan.Wc, plan.Ws, L, True,
                    bf16=bf, interpret=interpret))
            if meta["P_y"]:
                parts.append(project_pair_group_pallas(
                    f, plan.pair_pos_y, plan.pair_sha_y, plan.pair_shb_y,
                    plan.pair_sgn_y, plan.spec, plan.Wc, plan.Ws, L, False,
                    bf16=bf, interpret=interpret))
            p = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            p = jnp.take(p, jnp.asarray(meta["pair_inv_perm"]), axis=1)
            return restore(p.astype(image.dtype))
        group = lambda *a: project_group_pallas(
            f, *a, bf16=cdt == jnp.bfloat16, interpret=interpret)
    else:
        group = lambda *a: _project_group(f, *a, cdt=cdt)
    parts = []
    if meta["A_x"]:
        parts.append(group(
            plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws, L, True))
    if meta["A_y"]:
        parts.append(group(
            plan.pos_y, plan.shift_y, plan.spec, plan.Wc, plan.Ws, L, False))
    p = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    p = jnp.take(p, jnp.asarray(meta["inv_perm"]), axis=1)
    return restore(p.astype(image.dtype))


def parallel_backproject(plan: ParallelPlan, sino: jnp.ndarray, impl: str = None,
                         mesh=None, angle_axis: str = "angle",
                         batch_axis: str = None, interpret: bool = False) -> jnp.ndarray:
    """Exact transpose of :func:`parallel_project`. sino (..., A, S) → (..., N, N)."""
    if mesh is not None:
        from pdunet_tpu.parallel.angle_shard import angle_sharded_backproject

        p, restore = _collapse_batch(sino, 2)
        return restore(angle_sharded_backproject(
            plan, p, mesh, angle_axis, batch_axis, impl))
    meta = plan.meta
    N, L = meta["N"], meta["S_ext"]
    cdt = _CDT[meta.get("compute_dtype", "float32")]
    p, restore = _collapse_batch(sino, 2)
    p = p.astype(jnp.float32)
    if _resolve_impl(impl) == "pallas":
        from pdunet_tpu.ops.radon.pallas_kernels import (
            backproject_group_pallas,
            backproject_pair_group_pallas,
        )

        if meta.get("use_pairs"):
            # Mirror-pair fast path (exact transpose of the paired forward).
            bf = cdt == jnp.bfloat16
            f = jnp.zeros((p.shape[0], N, N), jnp.float32)
            if meta["P_x"]:
                px = jnp.take(p, jnp.asarray(meta["pair_take_x"]), axis=1)
                f = f + backproject_pair_group_pallas(
                    px, plan.pair_pos_x, plan.pair_sha_x, plan.pair_shb_x,
                    plan.pair_sgn_x, plan.pair_msk_x, plan.spec,
                    plan.Wc, plan.Ws, L, True, N, bf16=bf,
                    interpret=interpret)
            if meta["P_y"]:
                py = jnp.take(p, jnp.asarray(meta["pair_take_y"]), axis=1)
                f = f + backproject_pair_group_pallas(
                    py, plan.pair_pos_y, plan.pair_sha_y, plan.pair_shb_y,
                    plan.pair_sgn_y, plan.pair_msk_y, plan.spec,
                    plan.Wc, plan.Ws, L, False, N, bf16=bf,
                    interpret=interpret)
            return restore(f.astype(sino.dtype))
        group = lambda pp, *a: backproject_group_pallas(
            pp, *a, N, bf16=cdt == jnp.bfloat16, interpret=interpret)
    else:
        group = lambda pp, *a: _backproject_group(pp, *a, cdt=cdt)
    f = jnp.zeros((p.shape[0], N, N), jnp.float32)
    if meta["A_x"]:
        px = jnp.take(p, jnp.asarray(meta["idx_x"]), axis=1)
        f = f + group(
            px, plan.pos_x, plan.shift_x, plan.spec, plan.Wc, plan.Ws, L, True)
    if meta["A_y"]:
        py = jnp.take(p, jnp.asarray(meta["idx_y"]), axis=1)
        f = f + group(
            py, plan.pos_y, plan.shift_y, plan.spec, plan.Wc, plan.Ws, L, False)
    return restore(f.astype(sino.dtype))


# ---------------------------------------------------------------------------
# Ray-driven reference twin (oracle)
# ---------------------------------------------------------------------------


def _bilinear_sample(image: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample image (N, N) at fractional array coords; zero outside."""
    N = image.shape[-1]
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, w):
        valid = (xi >= 0) & (xi < N) & (yi >= 0) & (yi < N)
        v = image[jnp.clip(yi, 0, N - 1), jnp.clip(xi, 0, N - 1)]
        return jnp.where(valid, v, 0.0) * w

    return (
        tap(y0i, x0i, (1 - fx) * (1 - fy))
        + tap(y0i, x0i + 1, fx * (1 - fy))
        + tap(y0i + 1, x0i, (1 - fx) * fy)
        + tap(y0i + 1, x0i + 1, fx * fy)
    )


def parallel_project_ref(
    geom: ParallelGeometry, image: jnp.ndarray, oversample: int = 2
) -> jnp.ndarray:
    """Ray-driven line-integral oracle. image (N, N) → sinogram (A, S).

    Samples each ray uniformly with step ``pixel_spacing / oversample`` and
    bilinear interpolation — the same discretization family as torch-radon's
    texture sampler, kept simple for verifiability.
    """
    N = geom.image_size
    dp, ds = geom.pixel_spacing, geom.det_spacing
    S = geom.det_count
    angles = jnp.asarray(geom.angles)
    c = (N - 1) / 2.0
    s_coords = (jnp.arange(S) - (S - 1) / 2.0) * ds
    half_len = N * dp * math.sqrt(2.0) / 2.0
    n_t = int(2 * half_len / (dp / oversample)) + 1
    t = jnp.linspace(-half_len, half_len, n_t)
    dt = float(t[1] - t[0]) if n_t > 1 else 1.0

    def one_angle(theta):
        cs, sn = jnp.cos(theta), jnp.sin(theta)
        # ray point = s*ω + t*ω⊥, ω = (cosθ, sinθ)
        x = s_coords[:, None] * cs - t[None, :] * sn
        y = s_coords[:, None] * sn + t[None, :] * cs
        vals = _bilinear_sample(image, x / dp + c, y / dp + c)
        return vals.sum(axis=-1) * dt

    return lax.map(one_angle, angles)


# ---------------------------------------------------------------------------
# Operator bundle with custom_vjp adjoint pairing
# ---------------------------------------------------------------------------


class RadonOps(NamedTuple):
    """Differentiable operator bundle handed to models (SURVEY.md §1a: models
    hold operator handles, never geometry internals)."""

    A: Callable[[jnp.ndarray], jnp.ndarray]        # image → sinogram
    At: Callable[[jnp.ndarray], jnp.ndarray]       # sinogram → image (adjoint)
    fbp: Callable[..., jnp.ndarray]                # sinogram → image (filtered)
    geom: object
    image_shape: tuple
    sino_shape: tuple


def make_parallel_ops(geom: ParallelGeometry, dtype=jnp.float32, mesh=None,
                      angle_axis: str = "angle",
                      batch_axis: str = None) -> RadonOps:
    """Build the differentiable parallel-beam operator bundle for ``geom``.

    ``vjp(A) = At`` and ``vjp(At) = A`` exactly (the factored stages are
    transposed weight-for-weight), replacing torch-radon's autograd Function
    pairing (SURVEY.md §2c).

    ``mesh``: a jax.sharding.Mesh with an ``angle_axis`` dimension makes the
    bundle angle-sharded (parallel/angle_shard.py): each chip computes its
    own angle shard of the plan, the adjoint psums over the angle axis, and
    the Pallas kernels still run per shard on TPU. ``batch_axis`` names the
    mesh axis (if any) the leading batch dim is sharded over, composing
    with data parallelism on a 2-D mesh. This is the beyond-single-chip-HBM
    path (SURVEY.md §5.7): inputs must carry an explicit leading batch dim
    divisible by the batch axis size.
    """
    from pdunet_tpu.ops.radon.filtering import filter_sinogram

    plan = build_parallel_plan(geom, dtype=dtype)

    if mesh is not None:
        from pdunet_tpu.parallel.angle_shard import (
            angle_sharded_backproject,
            angle_sharded_project,
        )

        through = padded_batch_caller(mesh, batch_axis)
        _proj = lambda f: through(
            lambda x: angle_sharded_project(
                plan, x, mesh, angle_axis, batch_axis), f)
        _bproj = lambda p: through(
            lambda x: angle_sharded_backproject(
                plan, x, mesh, angle_axis, batch_axis), p)
    else:
        _proj = lambda f: parallel_project(plan, f)
        _bproj = lambda p: parallel_backproject(plan, p)

    @jax.custom_vjp
    def A(f):
        return _proj(f)

    def A_fwd(f):
        return A(f), None

    def A_bwd(_, g):
        return (_bproj(g),)

    A.defvjp(A_fwd, A_bwd)

    @jax.custom_vjp
    def At(p):
        return _bproj(p)

    def At_fwd(p):
        return At(p), None

    def At_bwd(_, g):
        return (_proj(g),)

    At.defvjp(At_fwd, At_bwd)

    n_angles = len(geom.angles)
    # FBP scale: continuous f = ∫_0^π (p ⊛ ramp) dθ ≈ (π/A)·Σ_a BP_a, and
    # At carries the δ_p²/δ_s mass factor of the forward model, so the
    # interpolation-weight backprojection is At · δ_s/δ_p².
    bp_scale = math.pi / n_angles * geom.det_spacing / (geom.pixel_spacing ** 2)

    def fbp(p, filter_name: str = "ramp"):
        return bp_scale * At(filter_sinogram(p, geom.det_spacing, filter_name))

    return RadonOps(
        A=A,
        At=At,
        fbp=fbp,
        geom=geom,
        image_shape=(geom.image_size, geom.image_size),
        sino_shape=(n_angles, geom.det_count),
    )
