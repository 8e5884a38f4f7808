"""Acquisition geometries and operator precomputation plans.

The reference framework (phernst/pd-unet) keeps geometry as per-script
constants spread across per-modality git branches (reference README.md:5) and
delegates the projector math to torch-radon's CUDA ray sampler. Here geometry
is a first-class, hashable config object, and the projector is *factored at
plan-build time* into static MXU-friendly tensors:

  TPU-native parallel-beam factorization
  --------------------------------------
  The Radon transform with a linear-interpolation pixel footprint is

      p[a, s] = sum_{j,i} f[j, i] * hat(s_s - x_i*cos θ_a - y_j*sin θ_a)

  For each angle we pick the *primary* image axis (the one whose direction
  cosine has magnitude >= √2/2) and factor the footprint into two hats
  (hat_δ ⊛ hat_δ ≈ quadratic B-spline footprint — a valid, slightly smoother
  projector model than the ideal box⊛box; accuracy is pinned by analytic
  ellipse tests, not by matching torch-radon's texture units bit-for-bit):

    stage 1 (resample): r[a, j, u] = sum_i f[j, i] * T_a[i, u]
        — ONE shared (N × S_ext) matrix per angle ⇒ a batched MXU matmul.
    stage 2 (shear-sum): p[a, s] = sum_j shift(r[a, j, ·], shift_{a,j})[s]
        — per-row fractional shifts along the detector axis.

  Stage 2 is executed in the DFT domain, entirely as matmuls: the plan
  stores rFFT(T) (so stage 1 lands directly in frequency space), the per-row
  shift becomes an elementwise phase multiply + row reduction, and a small
  (K × S) inverse-DFT matrix returns to detector space. Rationale, measured
  on a v5e chip at 256²/90 angles/batch 16: the grouped-convolution
  formulation took 180 s to compile and ~7 s to run; a take_along_axis
  2-tap gather ran 1.6 s (TPU gathers ~10⁸ elem/s); the DFT-matmul pipeline
  is ~100 GFLOP of pure MXU work (~ms) with second-scale compiles. The
  fractional shift is exact (spectral), so the composite footprint is the
  stage-1 linear splat itself. All phase tensors are stored as separate
  cos/sin float arrays — complex constants crash the axon TPU backend on
  host readback, and real-pair math is MXU-native anyway.

  Both stages are linear with *static* precomputed weights, so the adjoint is
  the exact transpose of each stage (matmul with T^T, conv with the unflipped
  kernel) — giving machine-precision ⟨Ax, y⟩ = ⟨x, A†y⟩ pairs for custom_vjp,
  something the reference's ray-driven-forward / pixel-driven-backward pair
  (torch-radon) only satisfies approximately.

  The stage-1 output grid is extended by M bins on both sides — not to hold
  the maximum stage-2 shift (both stages are spectral, so the intermediate
  never materializes and cannot clip), but to keep the circularly wrapped
  ringing of out-of-window mass away from the detector read window (see the
  wrap-safety derivation at the M computation below).

No gathers, no scatters, no dynamic shapes: everything lands on the MXU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ParallelGeometry",
    "FanGeometry",
    "RadialGeometry",
    "ParallelPlan",
    "build_parallel_plan",
]


def _uniform_angles(n_angles: int, angle_range: float, start: float) -> Tuple[float, ...]:
    return tuple(start + angle_range * k / n_angles for k in range(n_angles))


@dataclasses.dataclass(frozen=True)
class ParallelGeometry:
    """Parallel-beam CT geometry (reference: torch-radon ``Radon``; SURVEY §2b C1/C3).

    A ray at angle ``theta`` and signed detector coordinate ``s`` is the set
    ``{(x, y) : x cosθ + y sinθ = s}``.  Angles default to ``n_angles``
    uniformly spaced over [0, π).  ``angles`` (a tuple → hashable → usable as
    a jit static argument) overrides for sparse-view / limited-angle subsets.
    """

    image_size: int
    n_angles: int = 0
    det_count: int = 0          # 0 → image_size
    det_spacing: float = 1.0
    pixel_spacing: float = 1.0
    angles: Tuple[float, ...] = ()

    def __post_init__(self):
        if not self.angles:
            if self.n_angles <= 0:
                raise ValueError("need n_angles > 0 or explicit angles")
            object.__setattr__(
                self, "angles", _uniform_angles(self.n_angles, math.pi, 0.0)
            )
        object.__setattr__(self, "n_angles", len(self.angles))
        if self.det_count <= 0:
            object.__setattr__(self, "det_count", self.image_size)

    def subsample(self, factor: int) -> "ParallelGeometry":
        """Sparse-view geometry keeping every ``factor``-th angle."""
        return dataclasses.replace(self, angles=self.angles[::factor], n_angles=0)


@dataclasses.dataclass(frozen=True)
class FanGeometry:
    """Fan-beam CT geometry (reference: torch-radon ``RadonFanbeam``; SURVEY §2b C1/C3).

    Flat detector.  ``source_distance`` = source→isocenter, ``det_distance`` =
    isocenter→detector.  Angles default to uniform over [0, 2π).
    """

    image_size: int
    n_angles: int = 0
    source_distance: float = 0.0   # 0 → 2 * image_size
    det_distance: float = 0.0      # 0 → source_distance (det at 2*SD from source)
    det_count: int = 0             # 0 → 2 * image_size
    det_spacing: float = 0.0       # 0 → 2.0 * magnification-adjusted pixel
    pixel_spacing: float = 1.0
    angles: Tuple[float, ...] = ()

    def __post_init__(self):
        if not self.angles:
            if self.n_angles <= 0:
                raise ValueError("need n_angles > 0 or explicit angles")
            object.__setattr__(
                self, "angles", _uniform_angles(self.n_angles, 2.0 * math.pi, 0.0)
            )
        object.__setattr__(self, "n_angles", len(self.angles))
        if self.source_distance <= 0:
            object.__setattr__(self, "source_distance", 2.0 * self.image_size)
        if self.det_distance <= 0:
            object.__setattr__(self, "det_distance", self.source_distance)
        if self.det_count <= 0:
            object.__setattr__(self, "det_count", 2 * self.image_size)
        if self.det_spacing <= 0:
            mag = (self.source_distance + self.det_distance) / self.source_distance
            object.__setattr__(self, "det_spacing", mag * self.pixel_spacing)

    def subsample(self, factor: int) -> "FanGeometry":
        return dataclasses.replace(self, angles=self.angles[::factor], n_angles=0)


GOLDEN_ANGLE = math.pi * (3.0 - math.sqrt(5.0))  # ≈ 111.246° — golden-angle increment


@dataclasses.dataclass(frozen=True)
class RadialGeometry:
    """Golden-angle radial MRI k-space trajectory (SURVEY §2b C2/C3; paper §radial MRI).

    ``n_spokes`` diameter spokes through k-space center, spoke ``k`` at angle
    ``k * GOLDEN_ANGLE``; ``samples_per_spoke`` uniform radial samples over
    [-k_max, k_max) with k_max = π / pixel_spacing (Nyquist of the image grid).
    """

    image_size: int
    n_spokes: int
    samples_per_spoke: int = 0     # 0 → 2 * image_size
    pixel_spacing: float = 1.0
    angle_increment: float = GOLDEN_ANGLE

    def __post_init__(self):
        if self.samples_per_spoke <= 0:
            object.__setattr__(self, "samples_per_spoke", 2 * self.image_size)

    @property
    def spoke_angles(self) -> Tuple[float, ...]:
        return tuple(
            (k * self.angle_increment) % (2.0 * math.pi) for k in range(self.n_spokes)
        )

    def subsample(self, factor: int) -> "RadialGeometry":
        # Golden-angle subsampling = simply fewer consecutive spokes.
        return dataclasses.replace(self, n_spokes=self.n_spokes // factor)


# ---------------------------------------------------------------------------
# Parallel-beam plan
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class ParallelPlan:
    """Precomputed static tensors for the factored parallel-beam projector.

    Pytree: the weight arrays are leaves (so the plan can be passed through
    jit/grad/scan); geometry + derived integer metadata travel as aux data
    (static across traces).
    """

    ARRAY_FIELDS = (
        "pos_x", "shift_x",
        "pos_y", "shift_y",
        "spec", "Wc", "Ws",
        # mirror-pair factorization (see pair_group below): per angle PAIR,
        # one shared stage-1 row + both members' shift rows + the member-b
        # conjugation sign and validity mask. Consumed by the fused Pallas
        # pair kernels and the pair-sharded angle_shard path; the per-angle
        # CPU einsum twin keeps using the arrays above. Empty (0, N) when
        # the plan doesn't pair (use_pairs False).
        "pair_pos_x", "pair_sha_x", "pair_shb_x", "pair_sgn_x", "pair_msk_x",
        "pair_pos_y", "pair_sha_y", "pair_shb_y", "pair_sgn_y", "pair_msk_y",
    )

    def __init__(self, geom, meta, *arrays):
        self.geom = geom
        self.meta = meta  # dict of static ints/tuples
        for name, arr in zip(self.ARRAY_FIELDS, arrays):
            setattr(self, name, arr)

    def tree_flatten(self):
        return (
            tuple(getattr(self, n) for n in self.ARRAY_FIELDS),
            (self.geom, _HashableMeta(self.meta)),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        geom, meta = aux
        return cls(geom, meta.d, *children)


class _HashableMeta:
    """Immutable dict wrapper so plan aux-data is hashable (jit cache key)."""

    def __init__(self, d):
        self.d = dict(d)
        self._key = tuple(sorted((k, _freeze(v)) for k, v in self.d.items()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableMeta) and self._key == other._key


def _freeze(v):
    if isinstance(v, np.ndarray):
        return tuple(v.tolist())
    if isinstance(v, list):
        return tuple(v)
    return v


def _hat(t: np.ndarray, width: float) -> np.ndarray:
    """Triangular (linear-interpolation) footprint with unit mass at spacing=width."""
    return np.maximum(0.0, 1.0 - np.abs(t) / width)


def _kb(t: np.ndarray, width: float, beta: float) -> np.ndarray:
    """Kaiser-Bessel footprint, support |t| ≤ width/2 (t in detector units)."""
    x = t / (width / 2.0)
    mask = np.abs(x) <= 1.0
    return np.where(mask, np.i0(beta * np.sqrt(np.maximum(1.0 - x * x, 0.0))), 0.0)


KB_WIDTH = 4.0          # KB support in detector bins (gridding standard, σ=2)
KB_BETA = math.pi * math.sqrt((KB_WIDTH / 2.0) ** 2 * (2.0 - 0.5) ** 2 - 0.8)

#: half the minimum separation (in detector bins) between the read window
#: and the circularly wrapped band-limit ringing of out-of-window mass —
#: see the M computation in build_parallel_plan. Raising it reproduces the
#: conservative per-stage bound (M is capped there), at ~20-30% more FLOPs.
RING_GUARD = 24

#: floor for the same separation when snapping K down to a 128-lane MXU
#: tile boundary (see build_parallel_plan) — snapping never cuts the
#: wrap separation below 2·MIN_RING_GUARD bins.
MIN_RING_GUARD = 16


def build_parallel_plan(
    geom: ParallelGeometry, dtype=jnp.float32, footprint: str = "hat"
) -> ParallelPlan:
    """Build the compact factored-projector plan for ``geom``.

    The plan is ~1 MB regardless of geometry: the big (A, N, K) spectral
    tensors are generated *on the fly* inside the ops from outer products of
    these compact arrays (trig on the VPU is ~free next to the matmuls, and
    embedding hundreds of MB of constants into HLO both exploded compile
    times and overflowed the axon remote-compile request limit):

      ``pos_g``: (A_g, N) — stage-1 splat positions on the extended grid,
          in bins: prim_a·x_i/δ_s + M + c_s.
      ``shift_g``: (A_g, N) — stage-2 spectral shifts in bins: M − t_aj.
      ``spec``: (K,) — continuous footprint spectrum (quadrature of the
          kernel FT at the rFFT frequencies of the length-L = S_ext grid),
          scaled by δ_p²/δ_s. The stage-1 splat is thus an *exact*
          continuous-kernel convolution band-limited to the grid.
      ``Wc``/``Ws``: (K, S) — Hermitian-folded inverse-DFT matrix back to
          the S detector bins (c_k/L factors included).

    Forward per group: T̂[a,i,k] = spec[k]·e^{−2πik·pos/L} (generated),
    ĝ = f·T̂ (MXU) → multiply by e^{+2πik·shift/L} + row-reduce →
    p = Re(Ŝ·W) (MXU). The adjoint transposes each factor exactly.
    """
    N = geom.image_size
    S = geom.det_count
    dp, ds = geom.pixel_spacing, geom.det_spacing
    angles = np.asarray(geom.angles, dtype=np.float64)
    cos, sin = np.cos(angles), np.sin(angles)

    is_x = np.abs(cos) >= np.abs(sin)  # x-primary group
    idx_x = np.nonzero(is_x)[0]
    idx_y = np.nonzero(~is_x)[0]

    if footprint == "hat":
        kernel = lambda t: _hat(t, ds)
        half_support = 1.0  # in bins
    elif footprint == "kb":
        # Kaiser-Bessel footprint: used by the spectral (Fourier-slice) NUFFT
        # path, where its smooth, rapidly-decaying spectrum makes the
        # diagonal deapodization accurate to the gridding aliasing floor
        # (the sampled hat's transfer ripples ±20% near Nyquist).
        kernel = lambda t: _kb(t, KB_WIDTH * ds, KB_BETA)
        half_support = KB_WIDTH / 2.0
    else:
        raise ValueError(f"unknown footprint {footprint!r}")

    half = (N - 1) / 2.0 * dp
    # Wrap-safety extension M. Stages 1+2 compose into a SINGLE spectral
    # placement at the composite detector position (prim·x_i + seco·x_j)/δs
    # — both stages are exact spectral operations, so the sheared
    # intermediate never materializes in position space and the extension
    # does NOT need the per-stage worst case (the old bound, kept below as
    # a cap: max shear half·√2/2/δs ≈ 0.35·N·δp/δs bins). The composite
    # positions span ±dh = ±(half·max_a(|cosθ_a|+|sinθ_a|)/δs + support)
    # around the window center; with overhang ov = dh − (S−1)/2 the
    # circular grid L = S + 2M keeps a wrapped tail 2M − ov bins away from
    # the read window [0, S). The splat is the *band-limited* kernel, whose
    # position-space ringing decays like spec(π/δs)/(π·d) at distance d, so
    # a 2·ring_guard-bin separation bounds wrapped-ringing contamination at
    # ~0.4/(π·48) ≈ 3e-3 of a unit mass for the hat (KB rings less) —
    # below the oracle-test floor (tests/test_radon_parallel.py,
    # test_fourier_slice.py assert accuracy is unchanged). At the shipped
    # geometries this cuts K (and every MXU stage, which scales with K) by
    # ~20% (flagship CT) to ~30% (radial/fan backing plans, whose window
    # already spans the diagonal so ov = 0).
    m_ang = float(np.max(np.abs(cos) + np.abs(sin)))
    dh = half * m_ang / ds + half_support
    ov = max(0.0, dh - (S - 1) / 2.0)
    M_old = int(math.ceil(half * math.sqrt(0.5) / ds + half_support)) + 1
    M = min(int(math.ceil(ov / 2.0)) + RING_GUARD, M_old)
    # Snap K down to the MXU lane-tile boundary: every matmul and VPU stage
    # pads its K axis to multiples of 128 lanes, so K=389 and K=512 cost
    # identically — landing exactly on a boundary is pure savings. Snap only
    # when the wrap separation keeps at least MIN_RING_GUARD bins per side.
    K_cur = (S + 2 * M) // 2 + 1
    K_tile = ((K_cur - 1) // 128) * 128
    if K_tile >= 128:
        # largest L of S's parity with L//2 + 1 <= K_tile
        L_t = 2 * K_tile - 1 if S % 2 else 2 * (K_tile - 1)
        M_t = (L_t - S) // 2
        if M_t < M and 2 * M_t - ov >= 2 * MIN_RING_GUARD:
            M = M_t
    S_ext = S + 2 * M

    centers = (np.arange(N) - (N - 1) / 2.0) * dp            # pixel center coords

    L = S_ext
    K = L // 2 + 1
    k_grid = np.arange(K)

    c_s = (S - 1) / 2.0

    def group_arrays(idx, primary_cos):
        """primary_cos=True → primary coefficient is cosθ (x-primary group)."""
        if idx.size == 0:
            z = np.zeros((0, N), np.float64)
            return z, z
        prim = cos[idx] if primary_cos else sin[idx]
        seco = sin[idx] if primary_cos else cos[idx]
        # splat position of pixel line i at angle a, in extended-grid bins
        pos = prim[:, None] * centers[None, :] / ds + M + c_s   # (A_g, N)
        # stage-2 shift (bins): row j reads ext position s + (M − t)
        t = seco[:, None] * centers[None, :] / ds               # (A_g, N)
        return pos, M - t

    pos_x, shift_x = group_arrays(idx_x, primary_cos=True)
    pos_y, shift_y = group_arrays(idx_y, primary_cos=False)

    # ---- mirror-pair factorization --------------------------------------
    # Two angles in the same primary group share the dominant stage-1
    # spectral matmul (≈95% of projector FLOPs: (B,N,N)x(N,K) per angle)
    # whenever their primary direction cosines satisfy prim_b = ±prim_a:
    #
    #   prim_b = +prim_a  →  pos_b = pos_a          → ĝ_b = ĝ_a
    #   prim_b = −prim_a  →  pos_b = C − pos_a      → ĝ_b[k] = e^{−2πikC/L}·conj(ĝ_a[k])
    #                         (C = 2(M + c_s); f and spec are real)
    #
    # Uniform [0,π) scans pair θ ↔ π−θ (sgn −1), full-circle fan backings
    # additionally pair θ ↔ θ+π and θ ↔ 2π−θ — in all cases the angle count
    # of stage-1 matmuls nearly halves. Member b keeps its own shear row
    # (seco is unconstrained); for sgn = −1 the constant C folds into that
    # row, so the fused pair kernels (ops/radon/pallas_kernels.py) see a
    # uniform (pos, sha, shb, sgn, msk) description, and the angle-sharded
    # path shards whole pairs (parallel/angle_shard.py). The per-angle
    # arrays above stay authoritative for the unsharded CPU einsum twin;
    # pairing substitutes prim_b by ±prim_a exactly (match tolerance
    # 1e-12 on values computed from the same float64 angle tuple — the
    # induced operator perturbation is ~1e-10 relative, far below the
    # Pallas-vs-twin test tolerance).
    C_fold = 2.0 * (M + c_s)

    def pair_group(idx, primary_cos):
        if idx.size == 0:
            zN = np.zeros((0, N), np.float64)
            z1 = np.zeros((0,), np.float64)
            return dict(pos=zN, sha=zN, shb=zN, sgn=z1, msk=z1,
                        ia=np.zeros(0, np.int64), ib=np.zeros(0, np.int64))
        prim = cos[idx] if primary_cos else sin[idx]
        pos_g, shift_g = group_arrays(idx, primary_cos)
        A_g = idx.size
        matched = np.zeros(A_g, bool)
        ia, ib, sgn = [], [], []
        for i in range(A_g):
            if matched[i]:
                continue
            matched[i] = True
            partner, s = -1, 1.0
            for j in range(i + 1, A_g):
                if matched[j]:
                    continue
                if abs(prim[j] - prim[i]) < 1e-12:
                    partner, s = j, 1.0
                    break
                if abs(prim[j] + prim[i]) < 1e-12:
                    partner, s = j, -1.0
                    break
            if partner >= 0:
                matched[partner] = True
            ia.append(i)
            ib.append(partner)
            sgn.append(s)
        ia = np.asarray(ia, np.int64)
        ib = np.asarray(ib, np.int64)
        sgn = np.asarray(sgn, np.float64)
        msk = (ib >= 0).astype(np.float64)
        ib_safe = np.where(ib >= 0, ib, ia)
        shb = shift_g[ib_safe] - np.where(sgn < 0, C_fold, 0.0)[:, None]
        return dict(pos=pos_g[ia], sha=shift_g[ia], shb=shb,
                    sgn=sgn, msk=msk, ia=ia, ib=ib)

    pr_x = pair_group(idx_x, primary_cos=True)
    pr_y = pair_group(idx_y, primary_cos=False)
    P_x, P_y = len(pr_x["ia"]), len(pr_y["ia"])

    # Reassembly bookkeeping: the pair kernels emit rows
    # [x-pair0 a, x-pair0 b, x-pair1 a, ..., y-pair0 a, ...]; invalid
    # (unpaired) b rows are never selected. pair_take maps each adjoint
    # input row back to an original angle (invalid rows read member a and
    # are zeroed by the in-kernel mask).
    A = len(angles)
    pair_row_of_angle = np.full(A, -1, np.int64)
    take_rows = []
    off = 0
    for pr, idx_g in ((pr_x, idx_x), (pr_y, idx_y)):
        for p_i, (a_i, b_i) in enumerate(zip(pr["ia"], pr["ib"])):
            pair_row_of_angle[idx_g[a_i]] = off + 2 * p_i
            take_rows.append(int(idx_g[a_i]))
            if b_i >= 0:
                pair_row_of_angle[idx_g[b_i]] = off + 2 * p_i + 1
                take_rows.append(int(idx_g[b_i]))
            else:
                take_rows.append(int(idx_g[a_i]))
        off += 2 * len(pr["ia"])
    n_take_x = 2 * P_x
    # Worth fusing only when pairing actually shares matmuls: all-unpaired
    # plans (golden-angle radial backings) would pay doubled stage-2 work
    # for zero stage-1 savings.
    use_pairs = (P_x + P_y) <= 0.9 * max(1, A)
    if not use_pairs:
        # nothing reads the pair arrays — don't duplicate ~1.5× the plan
        # size on device (each dev() is also a separate materialize op)
        empty = dict(pos=np.zeros((0, N)), sha=np.zeros((0, N)),
                     shb=np.zeros((0, N)), sgn=np.zeros(0), msk=np.zeros(0))
        pr_x = pr_y = empty
        P_x = P_y = 0
        meta_pairs = dict(pair_inv_perm=(), pair_take_x=(), pair_take_y=())
    else:
        meta_pairs = dict(
            pair_inv_perm=tuple(int(i) for i in pair_row_of_angle),
            pair_take_x=tuple(take_rows[:n_take_x]),
            pair_take_y=tuple(take_rows[n_take_x:]),
        )

    # continuous footprint spectrum at the rFFT frequencies ω_k = 2πk/(L·δs):
    # spec[k] = (δp²/δs)·(1/δs)·∫kernel(t)·cos(ω_k t) dt
    tq = np.linspace(-half_support * ds, half_support * ds, 4096)
    kq = kernel(tq)
    omega = 2.0 * math.pi * k_grid / (L * ds)
    spec = (np.cos(np.outer(omega, tq)) @ kq) * (tq[1] - tq[0])
    spec = spec * (dp * dp / (ds * ds))

    # Hermitian-folded inverse DFT back to the S detector bins:
    # p[s] = Σ_k c_k/L · Re(Ŝ[k]·e^{+2πiks/L}), c_0 = c_{L/2} = 1 else 2
    ck = np.full(K, 2.0)
    ck[0] = 1.0
    if L % 2 == 0:
        ck[-1] = 1.0
    ang_w = 2.0 * math.pi * np.outer(k_grid, np.arange(S)) / L
    Wc = (ck[:, None] / L) * np.cos(ang_w)
    Ws = (ck[:, None] / L) * np.sin(ang_w)

    # Static inverse permutation: outputs are computed as [group_x; group_y]
    # and must be reassembled into the caller's angle order.
    order = np.concatenate([idx_x, idx_y])
    inv_perm = np.empty_like(order)
    inv_perm[order] = np.arange(order.size)

    meta = dict(
        N=N, S=S, M=M, S_ext=S_ext, K=K,
        A_x=int(idx_x.size), A_y=int(idx_y.size),
        inv_perm=tuple(int(i) for i in inv_perm),
        idx_x=tuple(int(i) for i in idx_x),
        idx_y=tuple(int(i) for i in idx_y),
        P_x=P_x, P_y=P_y, use_pairs=bool(use_pairs),
        **meta_pairs,
        # matmul operand dtype; positions/phases always stay f32 (trig
        # arguments span hundreds of radians — bf16 would destroy them)
        compute_dtype=np.dtype(dtype).name if dtype != jnp.float32 else "float32",
    )
    # dtype conversion happens host-side: an eager on-device
    # convert_element_type is a separate (remote, seconds-long) compile per
    # array shape on the axon TPU. materialize() routes each array through a
    # trivial device op — the axon backend cannot read back (or embed as HLO
    # constants) directly-transferred buffers. Arrays stay f32 (see
    # compute_dtype above); reduced precision applies to matmul operands
    # generated in-op.
    def dev(a):
        return jnp.asarray(np.asarray(a, np.float32))

    from pdunet_tpu.utils.device import materialize

    return materialize(ParallelPlan(
        geom,
        meta,
        dev(pos_x), dev(shift_x),
        dev(pos_y), dev(shift_y),
        dev(spec), dev(Wc), dev(Ws),
        dev(pr_x["pos"]), dev(pr_x["sha"]), dev(pr_x["shb"]),
        dev(pr_x["sgn"]), dev(pr_x["msk"]),
        dev(pr_y["pos"]), dev(pr_y["sha"]), dev(pr_y["shb"]),
        dev(pr_y["sgn"]), dev(pr_y["msk"]),
    ))
