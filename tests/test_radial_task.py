"""Radial-MRI PD-UNet task (BASELINE config 5): complex plumbing end-to-end."""

import dataclasses

import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.training.loop import train


def test_radial_pdunet_overfits():
    config = get_preset("pdunet_radial")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=48, samples_per_spoke=64,
            sparsity=4,
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=1, n_iters=2
        ),
        train=dataclasses.replace(
            config.train, batch_size=2, learning_rate=2e-3, warmup_steps=10,
            steps=100, log_every=10, n_ellipses=3,
        ),
    )
    result = train(config, fixed_data=True, verbose=False)
    first = result.history[0]["loss"]
    last = result.history[-1]["loss"]
    assert last < 0.7 * first, f"loss {first:.4f} → {last:.4f}"
    assert result.final_eval["psnr"] > 12.0


def test_spoke_interp_prefix_passthrough_and_accuracy():
    """interp_upsample_spokes: the shared golden-angle prefix passes through
    bit-exactly, and interpolated spokes approximate the true dense spokes
    of a smooth phantom far better than a zero-fill baseline."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdunet_tpu.data.pipeline import interp_upsample_spokes
    from pdunet_tpu.geometry import RadialGeometry
    from pdunet_tpu.ops.nufft import make_radial_ops

    dense = RadialGeometry(image_size=32, n_spokes=64, samples_per_spoke=64)
    sparse = dense.subsample(4)
    ops = make_radial_ops(dense)

    # smooth complex phantom: Gaussian blob with mild linear phase
    ax = jnp.linspace(-1, 1, 32)
    X, Y = jnp.meshgrid(ax, ax)
    img = jnp.exp(-((X - 0.1) ** 2 + Y**2) / 0.15) * jnp.exp(1j * (0.5 * X))
    g_dense = ops.A(img[None])
    g_interp = interp_upsample_spokes(
        g_dense[:, : sparse.n_spokes], sparse.spoke_angles, dense.spoke_angles
    )
    np.testing.assert_allclose(
        np.asarray(g_interp[:, : sparse.n_spokes]),
        np.asarray(g_dense[:, : sparse.n_spokes]),
        rtol=1e-6,
    )
    err = float(jnp.linalg.norm(g_interp - g_dense))
    zero_fill_err = float(
        jnp.linalg.norm(g_dense.at[:, : sparse.n_spokes].set(0) )
    )
    assert err < 0.5 * zero_fill_err, (err, zero_fill_err)
    # Per-spoke relative error, covering the wrap-spanning rows: a neighbor
    # reached across the π boundary contributes an extra sample-reversal
    # parity. Without it those rows carry 17-32% relative error on this
    # phantom; with it every interpolated spoke stays within a few percent.
    rel = np.asarray(
        jnp.linalg.norm(g_interp - g_dense, axis=-1)
        / (jnp.linalg.norm(g_dense, axis=-1) + 1e-12)
    )[0]
    assert rel.max() < 0.05, (rel.max(), np.argsort(rel)[-4:])


@pytest.mark.slow  # minutes-scale on the 1-core box
def test_spoke_upsampling_task_beats_interp_baseline():
    """The radial spoke-upsampling task (sino_unet on a radial geometry):
    overfitting a tiny fixed batch must reconstruct measurably better than
    the angular-interpolation input alone (the net's whole job). The
    baseline is obtained by zeroing the UNet's output convolution, which
    makes the residual exactly zero."""
    import jax
    import jax.numpy as jnp
    import optax

    from pdunet_tpu.ops.metrics import psnr
    from pdunet_tpu.training.tasks import build_task

    config = get_preset("sino_unet_radial")
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=48, samples_per_spoke=48
        ),
        model=dataclasses.replace(
            config.model, base_features=16, depth=3, use_bfloat16=False
        ),
        train=dataclasses.replace(config.train, batch_size=2, n_ellipses=3),
    )
    task = build_task(config)
    batch = task.make_batch(jax.random.PRNGKey(0))
    params = task.init_params(jax.random.PRNGKey(1))

    baseline = dict(params)
    baseline["Conv_0"] = jax.tree_util.tree_map(
        jnp.zeros_like, baseline["Conv_0"]
    )
    psnr_base = float(jnp.mean(psnr(task.recon_fn(baseline, batch),
                                    batch["image"])))

    vg = jax.jit(jax.value_and_grad(lambda p: task.loss_fn(p, batch)[0]))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    first = None
    for _ in range(400):
        l, g = vg(params)
        first = float(l) if first is None else first
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
    assert float(l) < 0.5 * first, (first, float(l))
    psnr_trained = float(jnp.mean(psnr(task.recon_fn(params, batch),
                                       batch["image"])))
    assert psnr_trained > psnr_base + 1.5, (psnr_trained, psnr_base)


def _tiny_radial(preset, snr_db):
    config = get_preset(preset)
    return dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=48, samples_per_spoke=64,
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=1, use_bfloat16=False,
            **({"n_iters": 2} if config.model.kind == "pdunet" else {}),
        ),
        train=dataclasses.replace(
            config.train, batch_size=2, n_ellipses=3, kspace_snr_db=snr_db
        ),
    )


def test_kspace_noise_wiring_pdunet_radial():
    """kspace_snr_db>0 must perturb the measured spokes (and f0) in both
    make_batch and the keyed batch_from_images path, leave the ground
    truth clean, and stay a strict no-op when disabled (SURVEY C4; the
    MRI analogue of --corrupt)."""
    import jax
    import jax.numpy as jnp

    from pdunet_tpu.training.tasks import build_task

    task = build_task(_tiny_radial("pdunet_radial", 30.0))
    key = jax.random.PRNGKey(0)
    batch = task.make_batch(key)
    img = (jnp.real(batch["image_c"]), jnp.imag(batch["image_c"]))
    clean = task.batch_from_images(img)
    noisy = task.batch_from_images(img, jax.random.PRNGKey(5))
    # ground truth untouched; measurement + f0 perturbed at ~30 dB
    assert jnp.allclose(clean["image"], noisy["image"])
    rel = float(
        jnp.linalg.norm(noisy["sino"] - clean["sino"])
        / jnp.linalg.norm(clean["sino"])
    )
    assert 0.02 < rel < 0.06, rel  # 30 dB ⇒ amplitude ratio ~0.032
    assert not jnp.allclose(noisy["f0"], clean["f0"])
    # make_batch applies the same corruption (training sees noise)
    resynth = task.batch_from_images(
        (jnp.real(batch["image_c"]), jnp.imag(batch["image_c"]))
    )
    assert not jnp.allclose(batch["sino"], resynth["sino"])

    # disabled task: keyed call is exactly the clean synthesis
    task0 = build_task(_tiny_radial("pdunet_radial", 0.0))
    c0 = task0.batch_from_images(img)
    n0 = task0.batch_from_images(img, jax.random.PRNGKey(5))
    assert (c0["sino"] == n0["sino"]).all()


def test_kspace_noise_wiring_sino_unet_radial():
    """Spoke-upsampling task: noise lands on the measured (acquired) spokes
    of the network input while the dense training target stays clean."""
    import jax
    import jax.numpy as jnp

    from pdunet_tpu.training.tasks import build_task

    task = build_task(_tiny_radial("sino_unet_radial", 30.0))
    key = jax.random.PRNGKey(0)
    batch = task.make_batch(key)
    img = (jnp.real(batch["image_c"]), jnp.imag(batch["image_c"]))
    clean = task.batch_from_images(img)
    noisy = task.batch_from_images(img, jax.random.PRNGKey(5))
    assert jnp.allclose(clean["image"], noisy["image"])
    # the clean dense target is identical with and without measurement noise
    assert jnp.allclose(clean["k_dense_w"], noisy["k_dense_w"])
    assert not jnp.allclose(clean["k_in_w"], noisy["k_in_w"])
    # training batches carry the corruption too (make_batch keyed it)
    assert not jnp.allclose(batch["k_in_w"], clean["k_in_w"])
    assert jnp.allclose(batch["k_dense_w"], clean["k_dense_w"], atol=1e-6)
