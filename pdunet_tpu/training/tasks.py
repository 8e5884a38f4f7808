"""Task definitions: one per reference config (BASELINE.json:6-12).

A Task bundles the model, the on-device batch synthesis, the loss and the
reconstruction function for one experiment preset. This is where the
reference's call stacks (SURVEY.md §3.3-3.5) are realized:

  sino_unet: sparse sino → angular interp → UNet residual → dense sino
             → L1(sino) + L1 through differentiable FBP       (§3.3)
  fbp_unet:  sparse sino → FBP (streaky) → UNet residual → L1  (§3.4)
  lpd:       unrolled PDHG with small conv nets                (C6)
  pdunet:    unrolled primal/dual UNets with A, A† inside      (§3.1)
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from pdunet_tpu.configs import ExperimentConfig, GeometryConfig
from pdunet_tpu.data.pipeline import (
    MU_WATER,
    interp_upsample_angles,
    kspace_gaussian_noise,
    lowdose_poisson_noise,
    subsample_angles,
)
from pdunet_tpu.data.synth import random_phantom_batch
from pdunet_tpu.geometry import ParallelGeometry
from pdunet_tpu.models.unet import UNet
from pdunet_tpu.ops import losses
from pdunet_tpu.ops.radon.parallel import make_parallel_ops

__all__ = ["Task", "build_task", "build_geometries"]


class Task(NamedTuple):
    name: str
    model: Any
    init_params: Callable[[jax.Array], Any]
    make_batch: Callable[[jax.Array], dict]
    loss_fn: Callable[[Any, dict], tuple]
    recon_fn: Callable[[Any, dict], jnp.ndarray]
    config: ExperimentConfig
    image_size: int
    # measurement synthesis for *given* ground-truth slices — the
    # file-backed training/evaluation path (SURVEY.md §2b C10-C12).
    # Signature: (images, key=None). With a key, the task's training
    # corruption (e.g. low-dose Poisson noise) is applied inside jit;
    # key=None is the noiseless evaluation default. Complex tasks accept
    # either a complex array or a (real, imag) float pair — complex64
    # cannot cross host→device on the axon TPU backend (utils/device.py).
    batch_from_images: Callable[..., dict] = None


def _finalize(name, model, init_params, make_batch, loss_fn, recon_fn, config,
              N, batch_from_images=None):
    """Jit the eager-callable task entry points: on the TPU every eager
    primitive is a separate (remote) compile, so un-jitted batch synthesis
    or model.init costs minutes of compile churn. One jit each fixes it;
    under an outer jit (the train step) they simply inline."""
    return Task(
        name, model, jax.jit(init_params), jax.jit(make_batch), loss_fn,
        recon_fn, config, N,
        jax.jit(batch_from_images) if batch_from_images else None,
    )


def build_geometries(gc: GeometryConfig):
    """Dense + sparse geometry pair for a config (parallel for now)."""
    if gc.kind == "parallel":
        coverage = gc.angular_coverage
        angles = tuple(
            coverage * math.pi * k / gc.n_angles for k in range(gc.n_angles)
        )
        dense = ParallelGeometry(
            image_size=gc.image_size,
            det_count=gc.det_count,
            det_spacing=gc.det_spacing,
            pixel_spacing=gc.pixel_spacing,
            angles=angles,
        )
        return dense, dense.subsample(gc.sparsity)
    if gc.kind == "fan":
        from pdunet_tpu.geometry import FanGeometry

        coverage = gc.angular_coverage
        angles = tuple(
            coverage * 2.0 * math.pi * k / gc.n_angles for k in range(gc.n_angles)
        )
        dense = FanGeometry(
            image_size=gc.image_size,
            det_count=gc.det_count,
            det_spacing=gc.det_spacing,
            pixel_spacing=gc.pixel_spacing,
            source_distance=gc.source_distance,
            det_distance=gc.det_distance,
            angles=angles,
        )
        return dense, dense.subsample(gc.sparsity)
    if gc.kind == "radial":
        from pdunet_tpu.geometry import RadialGeometry

        dense = RadialGeometry(
            image_size=gc.image_size,
            n_spokes=gc.n_angles,
            samples_per_spoke=gc.samples_per_spoke,
            pixel_spacing=gc.pixel_spacing,
        )
        return dense, dense.subsample(gc.sparsity)
    raise NotImplementedError(f"geometry kind {gc.kind!r} not built yet")


def _loss(name: str):
    return {"l1": losses.l1, "l2": losses.l2, "charbonnier": losses.charbonnier}[name]


def estimate_opnorm(A, At, image_shape, n_iters: int = 20, is_complex: bool = False) -> float:
    """Largest singular value of A via power iteration on A†A (runs once,
    eagerly, at task-build time)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, image_shape)
    if is_complex:
        x = x.astype(jnp.complex64)
    step = jax.jit(lambda v: At(A(v)))
    for _ in range(n_iters):
        y = step(x)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(y) ** 2))
        x = y / nrm
    sigma2 = jnp.sum(jnp.real(jnp.conj(x) * step(x))) / jnp.sum(jnp.abs(x) ** 2)
    return float(jnp.sqrt(sigma2))


def _maybe_noise(key, sino, photons):
    if photons <= 0:
        return sino
    # phantom densities are O(1) per pixel → scale to attenuation units so
    # the transmission model sees physically plausible line integrals
    return lowdose_poisson_noise(key, sino * MU_WATER, photons) / MU_WATER


def build_task(config: ExperimentConfig, mesh=None, angle_axis: str = "angle",
               batch_axis: str = None) -> Task:
    """``mesh``: angle-shard the physics operators over ``angle_axis`` of the
    given jax.sharding.Mesh (SURVEY.md §5.7 beyond-HBM path — all three
    geometries: parallel directly, fan through its extended-grid backing
    projector, radial through the projection-slice spoke axis).
    ``batch_axis`` names the mesh axis the batch is sharded over so the
    2-D data x angle composition holds inside the ops."""
    gc, mc, tc = config.geometry, config.model, config.train
    dense_geom, sparse_geom = build_geometries(gc)
    # use_bfloat16 applies to BOTH the networks and the physics operators'
    # matmul operands (phases/trig stay f32 inside the ops)
    dtype = jnp.bfloat16 if mc.use_bfloat16 else jnp.float32
    ops_sparse_local = None  # unsharded twin for batchless utility calls
    shard_kw = dict(mesh=mesh, angle_axis=angle_axis, batch_axis=batch_axis)
    if gc.kind == "fan":
        from pdunet_tpu.ops.radon.fan import make_fan_ops

        _mk_ops = make_fan_ops
    elif gc.kind == "radial":
        from pdunet_tpu.ops.nufft import make_radial_ops

        _mk_ops = make_radial_ops
    else:
        _mk_ops = make_parallel_ops
    ops_dense = _mk_ops(dense_geom, dtype=dtype, **shard_kw)
    ops_sparse = _mk_ops(sparse_geom, dtype=dtype, **shard_kw)
    if mesh is not None:
        # power iteration runs on a single (N, N) image — cheaper on the
        # unsharded twin; σ is a property of the operator, identical
        ops_sparse_local = _mk_ops(sparse_geom, dtype=dtype)
    # Measurement synthesis and direct recon (f0 / fbp input / the sino
    # tasks' output operator) run at FULL precision even when the learned
    # loop computes in bf16: the simulated measurement plays the role of
    # ground-truth physics, and synthesizing it in bf16 bakes ~1e-2
    # relative rounding into the data itself. Measured at the shipped
    # radial config (dense-spoke DCF-adjoint recon of the TRUE data):
    # bf16-synthesized measurements cap the task at 47.70 dB/0.962 vs
    # 49.33 dB/0.984 with f32 synthesis — and the output fbp's precision
    # is irrelevant (49.345 bf16 vs 49.326 f32). Only the unroll operators
    # A_n/At_n (n_iters× per step, speed-critical) keep the preset dtype.
    if dtype == jnp.float32:
        ops_synth_dense, ops_synth_sparse = ops_dense, ops_sparse
    else:
        ops_synth_dense = _mk_ops(dense_geom, dtype=jnp.float32, **shard_kw)
        ops_synth_sparse = _mk_ops(sparse_geom, dtype=jnp.float32, **shard_kw)
    loss = _loss(tc.loss)
    N = gc.image_size
    B = tc.batch_size

    def phantoms(key):
        return random_phantom_batch(key, B, N, n_ellipses=tc.n_ellipses,
                                    pixel_spacing=gc.pixel_spacing)

    if mc.kind == "fbp_unet":
        model = UNet(out_channels=1, base_features=mc.base_features,
                     depth=mc.depth, stem=mc.stem, dtype=dtype,
                     upsample=mc.upsample)

        def make_batch(key):
            k1, k2 = jax.random.split(key)
            img = phantoms(k1)
            sino = _maybe_noise(k2, ops_synth_sparse.A(img), tc.photons_per_ray)
            fbp = ops_synth_sparse.fbp(sino)
            return {"image": img, "fbp": fbp}

        def init_params(key):
            return model.init(key, jnp.zeros((1, N, N, 1)))["params"]

        def predict(params, batch):
            x = batch["fbp"][..., None]
            return batch["fbp"] + model.apply({"params": params}, x)[..., 0]

        def loss_fn(params, batch):
            pred = predict(params, batch)
            return loss(pred, batch["image"]), {}

        def batch_from_images(img, key=None):
            sino = ops_synth_sparse.A(img)
            if key is not None:
                sino = _maybe_noise(key, sino, tc.photons_per_ray)
            return {"image": img, "fbp": ops_synth_sparse.fbp(sino)}

        return _finalize(config.name, model, init_params, make_batch, loss_fn,
                         predict, config, N, batch_from_images)

    if mc.kind == "sino_unet" and gc.kind == "radial":
        # Spoke-domain upsampling for radial MRI — the paper's title
        # capability applied to its second modality (SURVEY.md §2b C4,
        # §3.3): sparse golden-angle spokes → angular interp to the dense
        # spoke set → UNet residual (Re/Im channels) → dense spokes →
        # L1 + image L1 through the differentiable DC-adjoint.
        #
        # The UNet does NOT see raw k-space: golden-angle spokes are ~111°
        # apart in sequence order (no local row structure), and k-space
        # phase oscillates too fast along the readout for convolutions
        # (both variants measured flat overfit loss). Instead each spoke
        # is mapped by a per-row orthonormal inverse FFT to its
        # projection-domain twin (the central-slice theorem: a spoke's
        # 1-D IFFT is the object's parallel projection at that angle) and
        # rows are canonicalized mod π (sample-reversing θ ≥ π spokes)
        # and sorted by angle — a smooth complex sinogram exactly like the
        # CT upsampling task's input. The transform is a static
        # permutation + flip + ortho FFT, inverted exactly on the way out.
        import numpy as np

        from pdunet_tpu.data.pipeline import (
            interp_upsample_spokes,
            reverse_spoke_samples,
        )

        model = UNet(out_channels=2, base_features=mc.base_features,
                     depth=mc.depth, stem=mc.stem, dtype=dtype,
                     upsample=mc.upsample)
        dense_angles = dense_geom.spoke_angles
        sparse_angles = sparse_geom.spoke_angles
        A_s = sparse_geom.n_spokes

        _phi = np.asarray(dense_angles) % (2.0 * np.pi)
        _flip = _phi >= np.pi
        _perm = np.argsort(_phi % np.pi, kind="stable")
        _inv_perm = np.argsort(_perm, kind="stable")
        _flip_sorted = jnp.asarray(_flip[_perm])[:, None]
        _perm_j = jnp.asarray(_perm)
        _inv_perm_j = jnp.asarray(_inv_perm)
        # Static O(1) normalization: projection values grow ~linearly with
        # the image size (line integrals of O(1) densities), so at 256² the
        # raw net-domain inputs are O(60). Unnormalized, the first training
        # steps see grad norms in the hundreds, which inflates Adam's
        # second moment and flatlines learning for ~1/(1-β₂) steps
        # (observed: full-scale eval frozen at the interp baseline).
        _scale = 0.25 * N

        def to_net_domain(k):
            s = jnp.take(k, _perm_j, axis=-2)
            s = jnp.where(_flip_sorted, reverse_spoke_samples(s), s)
            p = jnp.fft.ifft(jnp.fft.ifftshift(s, axes=-1), axis=-1,
                             norm="ortho")
            return jnp.fft.fftshift(p, axes=-1) / _scale

        def from_net_domain(p):
            s = jnp.fft.fft(jnp.fft.ifftshift(p * _scale, axes=-1), axis=-1,
                            norm="ortho")
            s = jnp.fft.fftshift(s, axes=-1)
            s = jnp.where(_flip_sorted, reverse_spoke_samples(s), s)
            return jnp.take(s, _inv_perm_j, axis=-2)

        def _phase_field(key):
            coeffs = jax.random.uniform(key, (B, 4), minval=-jnp.pi, maxval=jnp.pi)
            ax = jnp.linspace(-1.0, 1.0, N)
            X, Y = jnp.meshgrid(ax, ax)
            return (coeffs[:, 0, None, None] * X
                    + coeffs[:, 1, None, None] * Y
                    + coeffs[:, 2, None, None] * X * Y
                    + coeffs[:, 3, None, None] * (X**2 - Y**2))

        def _batch_from_complex(img_c, key=None):
            g_dense = ops_synth_dense.A(img_c)
            # golden-angle subsample keeps the spoke-sequence prefix, so
            # the sparse measurement is literally the first A_s spokes
            g_meas = g_dense[..., :A_s, :]
            if key is not None:
                # measurement noise hits only what the scanner acquired;
                # the dense target k_dense_w stays the clean ground truth
                g_meas = kspace_gaussian_noise(key, g_meas, tc.kspace_snr_db)
            g_in = interp_upsample_spokes(g_meas, sparse_angles, dense_angles)
            return {
                "image": jnp.abs(img_c),
                # carried so eval paths can reconstruct the *phased* ground
                # truth (infer.py's noiseless synthetic eval re-synthesizes
                # measurements from image_c; magnitude alone would silently
                # evaluate an easier zero-phase distribution)
                "image_c": img_c,
                "k_dense_w": to_net_domain(g_dense),
                "k_in_w": to_net_domain(g_in),
            }

        def make_batch(key):
            k1, k2, k3 = jax.random.split(key, 3)
            mag = random_phantom_batch(
                k1, B, N, n_ellipses=tc.n_ellipses,
                pixel_spacing=gc.pixel_spacing, nonneg=True,
            )
            img_c = mag.astype(jnp.complex64) * jnp.exp(1j * _phase_field(k2))
            return _batch_from_complex(
                img_c, k3 if tc.kspace_snr_db > 0 else None
            )

        def init_params(key):
            A_d, S = ops_dense.sino_shape
            return model.init(key, jnp.zeros((1, A_d, S, 2)))["params"]

        # Hard data consistency (net-domain): sorted row j is a measured
        # spoke iff its dense-sequence index is in the golden-angle prefix
        # (subsample keeps spokes 0..A_s-1); interp_upsample_spokes snaps
        # exact angle hits to the source spoke, so k_in_w carries the exact
        # measurement on those rows — re-impose them on the output.
        _measured_rows = jnp.asarray(_perm < A_s)[:, None]

        def predict_kw(params, batch):
            x = jnp.stack(
                [jnp.real(batch["k_in_w"]), jnp.imag(batch["k_in_w"])], axis=-1
            )
            out = model.apply({"params": params}, x)
            pred = batch["k_in_w"] + jax.lax.complex(out[..., 0], out[..., 1])
            return jnp.where(_measured_rows, batch["k_in_w"], pred)

        def recon_fn(params, batch):
            pred = from_net_domain(predict_kw(params, batch))
            return jnp.abs(ops_synth_dense.fbp(pred))

        def loss_fn(params, batch):
            pred_w = predict_kw(params, batch)
            total = 0.0
            aux = {}
            if tc.sino_loss_weight:
                ls = jnp.mean(jnp.abs(pred_w - batch["k_dense_w"]))
                total += tc.sino_loss_weight * ls
                aux["sino_loss"] = ls
            if tc.img_loss_weight:
                li = loss(
                    jnp.abs(ops_synth_dense.fbp(from_net_domain(pred_w))),
                    batch["image"],
                )
                total += tc.img_loss_weight * li
                aux["img_loss"] = li
            return total, aux

        def batch_from_images(img, key=None):
            if isinstance(img, (tuple, list)):
                img_c = jax.lax.complex(
                    jnp.asarray(img[0], jnp.float32),
                    jnp.asarray(img[1], jnp.float32),
                )
            else:
                img_c = img.astype(jnp.complex64)
            if tc.kspace_snr_db <= 0:
                key = None  # noiseless task: --corrupt has nothing to add
            return _batch_from_complex(img_c, key)

        return _finalize(config.name, model, init_params, make_batch, loss_fn,
                         recon_fn, config, N, batch_from_images)

    if mc.kind == "sino_unet":
        if gc.kind == "fan":
            # interp_upsample_angles' past-the-end wrap uses the parallel-beam
            # symmetry p(θ+π, s) = p(θ, −s); for fan sinograms the conjugate
            # ray lives at β+π−2γ with a nonlinearly remapped detector axis,
            # so the wrap (and hence this task formulation) is invalid.
            raise ValueError(
                "sino_unet is not defined for fan geometry: the angular "
                "upsampling wrap relies on parallel-beam detector-flip "
                "symmetry. Use parallel (sino_unet) or fan (pdunet/fbp_unet)."
            )
        model = UNet(out_channels=1, base_features=mc.base_features,
                     depth=mc.depth, stem=mc.stem, dtype=dtype,
                     upsample=mc.upsample)
        k = gc.sparsity

        def make_batch(key):
            k1, k2 = jax.random.split(key)
            img = phantoms(k1)
            sino_dense = ops_synth_dense.A(img)
            sino_sparse = _maybe_noise(
                k2, subsample_angles(sino_dense, k), tc.photons_per_ray
            )
            sino_in = interp_upsample_angles(sino_sparse, k, gc.angular_coverage)
            return {"image": img, "sino_dense": sino_dense, "sino_in": sino_in}

        def init_params(key):
            A = dense_geom.n_angles
            S = dense_geom.det_count
            return model.init(key, jnp.zeros((1, A, S, 1)))["params"]

        # Hard data consistency: dense row i is an actual measurement iff
        # i % k == 0 (subsample_angles keeps every k-th row) and
        # interp_upsample_angles passes those rows through exactly, so
        # re-imposing them on the network output guarantees the prediction
        # never degrades measured data — the UNet only fills interpolated
        # rows. Static (A,1) mask broadcast, TPU-friendly (no gathers).
        measured_rows = (jnp.arange(dense_geom.n_angles) % k == 0)[:, None]

        def predict_sino(params, batch):
            x = batch["sino_in"][..., None]
            pred = batch["sino_in"] + model.apply({"params": params}, x)[..., 0]
            return jnp.where(measured_rows, batch["sino_in"], pred)

        def recon_fn(params, batch):
            return ops_synth_dense.fbp(predict_sino(params, batch))

        def loss_fn(params, batch):
            pred_sino = predict_sino(params, batch)
            total = 0.0
            aux = {}
            if tc.sino_loss_weight:
                ls = loss(pred_sino, batch["sino_dense"])
                total += tc.sino_loss_weight * ls
                aux["sino_loss"] = ls
            if tc.img_loss_weight:
                li = loss(ops_synth_dense.fbp(pred_sino), batch["image"])
                total += tc.img_loss_weight * li
                aux["img_loss"] = li
            return total, aux

        def batch_from_images(img, key=None):
            sino_dense = ops_synth_dense.A(img)
            sino_sparse = subsample_angles(sino_dense, k)
            if key is not None:
                sino_sparse = _maybe_noise(key, sino_sparse, tc.photons_per_ray)
            sino_in = interp_upsample_angles(sino_sparse, k, gc.angular_coverage)
            return {"image": img, "sino_dense": sino_dense, "sino_in": sino_in}

        return _finalize(config.name, model, init_params, make_batch, loss_fn,
                         recon_fn, config, N, batch_from_images)

    if mc.kind in ("pdunet", "lpd"):
        from pdunet_tpu.models.primal_dual import make_lpd, make_pdunet

        is_complex = gc.kind == "radial"
        # Spectral normalization (standard LPD practice): hand the unroll
        # operators scaled to unit norm so network inputs stay O(1)
        # regardless of geometry — the raw NUFFT adjoint, e.g., has norm in
        # the thousands. The 1/σ factors are plain closures around the
        # custom_vjp ops, so gradients stay exactly paired.
        opnorm_ops = ops_sparse_local if ops_sparse_local is not None else ops_sparse
        sigma = estimate_opnorm(
            opnorm_ops.A, opnorm_ops.At, (N, N), is_complex=is_complex
        )
        A_n = lambda f: ops_sparse.A(f) / sigma
        At_n = lambda p: ops_sparse.At(p) / sigma
        if mc.kind == "pdunet":
            model = make_pdunet(
                A=A_n, At=At_n, n_iters=mc.n_iters,
                base_features=mc.base_features, depth=mc.depth,
                stem=mc.stem, dtype=dtype, complex_ops=is_complex,
                remat=mc.remat, upsample=mc.upsample,
            )
        else:
            model = make_lpd(
                A=A_n, At=At_n, n_iters=mc.n_iters,
                features=mc.lpd_features,
                primal_channels=mc.primal_channels,
                dual_channels=mc.dual_channels, dtype=dtype,
                complex_ops=is_complex, remat=mc.remat,
            )

        if is_complex:
            # complex-valued MRI data (BASELINE config 5): magnitude phantom
            # with a smooth random phase field (low-order spatial harmonics).
            # The magnitude is sampled nonnegative (nonneg ellipse
            # intensities): signed densities make |pred| vs gt an impossible
            # target wherever overlaps go negative (round-1 17±7.6 dB
            # pathology; nonneg restores 33+ dB in the A/B diagnostics), and
            # an unlucky all-negative draw would clamp to a zero image whose
            # peak-normalized PSNR is -inf.
            def make_batch(key):
                k1, k2, k3 = jax.random.split(key, 3)
                mag = random_phantom_batch(
                    k1, B, N, n_ellipses=tc.n_ellipses,
                    pixel_spacing=gc.pixel_spacing, nonneg=True,
                )
                coeffs = jax.random.uniform(
                    k2, (B, 4), minval=-jnp.pi, maxval=jnp.pi
                )
                ax = jnp.linspace(-1.0, 1.0, N)
                X, Y = jnp.meshgrid(ax, ax)
                phase = (
                    coeffs[:, 0, None, None] * X
                    + coeffs[:, 1, None, None] * Y
                    + coeffs[:, 2, None, None] * X * Y
                    + coeffs[:, 3, None, None] * (X**2 - Y**2)
                )
                img_c = mag.astype(jnp.complex64) * jnp.exp(1j * phase)
                g = ops_synth_sparse.A(img_c)
                if tc.kspace_snr_db > 0:
                    g = kspace_gaussian_noise(k3, g, tc.kspace_snr_db)
                f0 = ops_synth_sparse.fbp(g)
                return {"image": mag, "image_c": img_c, "sino": g, "f0": f0}

            def init_params(key):
                A_sp, S = ops_sparse.sino_shape
                return model.init(
                    key,
                    jnp.zeros((1, A_sp, S), jnp.complex64),
                    jnp.zeros((1, N, N), jnp.complex64),
                )["params"]

            def predict_c(params, batch):
                # measurements scaled like A_n so the dual net sees O(1) inputs
                return model.apply(
                    {"params": params}, batch["sino"] / sigma, batch["f0"]
                )

            def recon_fn(params, batch):
                return jnp.abs(predict_c(params, batch))

            def loss_fn(params, batch):
                # tc.loss applies on the complex residual (losses.* reduce
                # |d| / |d|² so complex inputs yield a real scalar)
                return loss(predict_c(params, batch), batch["image_c"]), {}

            def batch_from_images(img, key=None):
                # (re, im) pair → complex on device (axon: complex64 cannot
                # cross host→device); plain arrays are cast
                if isinstance(img, (tuple, list)):
                    img_c = jax.lax.complex(
                        jnp.asarray(img[0], jnp.float32),
                        jnp.asarray(img[1], jnp.float32),
                    )
                else:
                    img_c = img.astype(jnp.complex64)
                g = ops_synth_sparse.A(img_c)
                if key is not None and tc.kspace_snr_db > 0:
                    g = kspace_gaussian_noise(key, g, tc.kspace_snr_db)
                return {"image": jnp.abs(img_c), "image_c": img_c,
                        "sino": g, "f0": ops_synth_sparse.fbp(g)}

        else:
            def make_batch(key):
                k1, k2 = jax.random.split(key)
                img = phantoms(k1)
                g = _maybe_noise(k2, ops_synth_sparse.A(img), tc.photons_per_ray)
                f0 = ops_synth_sparse.fbp(g)
                return {"image": img, "sino": g, "f0": f0}

            def init_params(key):
                A_sp, S = ops_sparse.sino_shape
                return model.init(
                    key, jnp.zeros((1, A_sp, S)), jnp.zeros((1, N, N))
                )["params"]

            def recon_fn(params, batch):
                return model.apply(
                    {"params": params}, batch["sino"] / sigma, batch["f0"]
                )

            def loss_fn(params, batch):
                return loss(recon_fn(params, batch), batch["image"]), {}

            def batch_from_images(img, key=None):
                g = ops_synth_sparse.A(img)
                if key is not None:
                    g = _maybe_noise(key, g, tc.photons_per_ray)
                return {"image": img, "sino": g, "f0": ops_synth_sparse.fbp(g)}

        return _finalize(config.name, model, init_params, make_batch, loss_fn,
                         recon_fn, config, N, batch_from_images)

    raise NotImplementedError(f"model kind {mc.kind!r} not built yet")
