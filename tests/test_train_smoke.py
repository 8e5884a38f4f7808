"""Training smoke tests (SURVEY.md §4.2 tier 5): each task overfits a tiny
fixed batch in a few dozen steps on CPU."""

import dataclasses

import pytest

from pdunet_tpu.configs import get_preset
from pdunet_tpu.configs.base import GeometryConfig, ModelConfig, TrainConfig
from pdunet_tpu.training.loop import train


def tiny(config, **model_kw):
    return dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, image_size=32, n_angles=40, sparsity=4
        ),
        model=dataclasses.replace(
            config.model, base_features=8, depth=2, **model_kw
        ),
        train=dataclasses.replace(
            config.train,
            batch_size=2,
            learning_rate=3e-3,
            warmup_steps=10,
            steps=150,
            log_every=10,
            n_ellipses=3,
        ),
    )


# sino_unet's loss includes the image term through FBP, which floors higher
# on a 32² toy problem — hence the looser drop requirement. Together with
# test_primal_dual.test_overfit_tiny (pdunet/lpd) and
# test_radial_task.test_radial_pdunet_overfits this covers all five presets
# (SURVEY.md §4.2 tier 5 "each of the 5 configs").
@pytest.mark.slow
@pytest.mark.parametrize(
    "preset,drop",
    [
        ("fbp_unet_parallel", 0.5),
        ("sino_unet_parallel", 0.7),
        ("pdunet_fan", 0.7),  # low-dose noise + limited angle: noisier floor
    ],
)
def test_overfit_tiny_batch(preset, drop):
    config = tiny(get_preset(preset))
    result = train(config, fixed_data=True, verbose=False)
    first = result.history[0]["loss"]
    last = result.history[-1]["loss"]
    assert last < drop * first, f"{preset}: loss {first:.4f} → {last:.4f} did not drop"
    assert result.final_eval["psnr"] > 10.0


def test_checkpoint_resume(tmp_path):
    config = tiny(get_preset("fbp_unet_parallel"))
    config = dataclasses.replace(
        config,
        train=dataclasses.replace(
            config.train, ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=20, steps=40,
            log_every=20,
        ),
    )
    r1 = train(config, fixed_data=True, verbose=False)
    # Second call resumes from step 40 and trains to 60
    config2 = dataclasses.replace(
        config, train=dataclasses.replace(config.train, steps=60)
    )
    r2 = train(config2, fixed_data=True, verbose=False)
    assert int(r2.state.step) == 60
    assert r2.history[-1]["loss"] <= r1.history[-1]["loss"] * 1.5


def test_file_backed_training(tmp_path):
    """train(data=...) consumes an HDF5 slice store through the host
    prefetcher; measurement synthesis + corruption run inside the jitted
    step. The loss must drop like the synthetic path's (VERDICT r1 #3)."""
    from pdunet_tpu.data.datasets import write_phantom_dataset

    path = write_phantom_dataset(
        str(tmp_path / "slices.h5"), n_slices=40, image_size=32,
        n_ellipses=3, seed=3,
    )
    config = tiny(get_preset("fbp_unet_parallel"))
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, steps=120)
    )
    result = train(config, data=path, verbose=False)
    first = result.history[0]["loss"]
    last = result.history[-1]["loss"]
    assert last < 0.6 * first, f"file-backed loss {first:.4f} → {last:.4f}"
    assert result.final_eval["psnr"] > 15.0


def test_file_backed_split_smaller_than_batch_errors(tmp_path):
    """A split smaller than the batch size must error loudly instead of
    spinning forever in the drop-remainder batch iterator."""
    from pdunet_tpu.data.datasets import write_phantom_dataset

    path = write_phantom_dataset(
        str(tmp_path / "tiny.h5"), n_slices=4, image_size=32, seed=5,
    )
    config = tiny(get_preset("fbp_unet_parallel"))
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, batch_size=8)
    )
    with pytest.raises(ValueError, match="batch_size"):
        train(config, data=path, verbose=False)


def test_file_backed_complex_radial(tmp_path):
    """Complex HDF5 slices feed the radial task as (re, im) pairs (the axon
    backend cannot transfer complex64), and training steps run."""
    from pdunet_tpu.data.datasets import write_phantom_dataset

    path = write_phantom_dataset(
        str(tmp_path / "mri.h5"), n_slices=12, image_size=32,
        n_ellipses=3, seed=4, complex_phase=True,
    )
    config = tiny(get_preset("pdunet_radial"), n_iters=2)
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(
            config.geometry, n_angles=48, samples_per_spoke=48
        ),
        train=dataclasses.replace(config.train, steps=8, log_every=4),
    )
    result = train(config, data=path, verbose=False)
    assert len(result.history) >= 2
    assert all(h["loss"] > 0 for h in result.history)


def test_checkify_step_clean_and_catches_nan():
    """The checkify sanitizer path (SURVEY.md §5.2): a healthy step runs
    clean under float+index checks, and a poisoned batch (NaN ground truth)
    is caught with a thrown JaxRuntimeError instead of silently training."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    from pdunet_tpu.training.loop import build_state, make_train_step
    from pdunet_tpu.training.tasks import build_task

    config = tiny(get_preset("fbp_unet_parallel"))
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, steps=2)
    )
    task = build_task(config)
    state = build_state(task)
    step = make_train_step(task, donate=False, checked=True)
    err, (state, metrics) = step(state, jax.random.PRNGKey(0))
    err.throw()  # no check fires on healthy data
    assert jnp.isfinite(metrics["loss"])

    def poisoned(params):
        batch = task.make_batch(jax.random.PRNGKey(0))
        batch = dict(batch, image=jnp.full_like(batch["image"], jnp.nan))
        return task.loss_fn(params, batch)[0]

    checked_loss = checkify.checkify(
        poisoned, errors=checkify.float_checks
    )
    err, _ = jax.jit(checked_loss)(state.params)
    with pytest.raises(Exception, match="nan"):
        err.throw()


def test_grad_clip_bounds_spike_updates():
    """`train.grad_clip` must bound the optimizer's response to a gradient
    spike (the sino_unet_radial collapse: one spike at high LR stranded
    Adam's second moment and froze the run for 7k steps). A huge gradient
    through the clipped state must move params no further than the clip
    norm allows, while grad_clip=0 keeps the plain (checkpoint-compatible)
    Adam tree."""
    import jax
    import jax.numpy as jnp
    import optax

    from pdunet_tpu.training.loop import build_state
    from pdunet_tpu.training.tasks import build_task

    # every shipped preset now clips; build the plain variant explicitly
    config = tiny(get_preset("fbp_unet_parallel"))
    plain_cfg = dataclasses.replace(
        config, train=dataclasses.replace(config.train, grad_clip=0.0)
    )
    task = build_task(plain_cfg)

    plain = build_state(task)
    clipped_cfg = dataclasses.replace(
        config, train=dataclasses.replace(config.train, grad_clip=0.5)
    )
    clipped = build_state(build_task(clipped_cfg))

    # grad_clip=0 → plain Adam state tree (old checkpoints restore into it)
    assert jax.tree_util.tree_structure(plain.opt_state) != jax.tree_util.tree_structure(
        clipped.opt_state
    )

    spike = jax.tree.map(lambda p: jnp.full_like(p, 1e6), clipped.params)
    after = clipped.apply_gradients(grads=spike)
    # the clip rescales the spike to global norm 0.5 before Adam sees it;
    # Adam's per-param step is then bounded by the LR, not the spike size
    delta = optax.global_norm(
        jax.tree.map(lambda a, b: a - b, after.params, clipped.params)
    )
    n_params = sum(x.size for x in jax.tree.leaves(clipped.params))
    lr_bound = 3e-3 * jnp.sqrt(n_params)  # |adam update| <= ~lr per param
    assert float(delta) <= float(lr_bound), (
        f"clipped spike moved params {float(delta):.3e} > bound {float(lr_bound):.3e}"
    )


def test_checkpoint_restores_across_remat_flip(tmp_path):
    """`model.remat` is a speed/memory knob, not a model change — flipping
    it renames flax's scan module (Scan_* ↔ ScanCheckpoint_*) and must NOT
    strand existing checkpoints (this bit the round-3 matrix: remat=True
    checkpoints were unreadable after the remat default changed to False)."""
    import jax
    import jax.numpy as jnp

    from pdunet_tpu.training.checkpoint import CheckpointManager
    from pdunet_tpu.training.loop import build_state
    from pdunet_tpu.training.tasks import build_task

    config = tiny(get_preset("pdunet_parallel"), stem=1)
    saved_task = build_task(
        dataclasses.replace(
            config, model=dataclasses.replace(config.model, remat=True)
        )
    )
    saved = build_state(saved_task)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, saved)
    mgr.wait()

    # template built with the OTHER remat setting must still restore
    load_task = build_task(
        dataclasses.replace(
            config, model=dataclasses.replace(config.model, remat=False)
        )
    )
    template = build_state(load_task)
    restored = CheckpointManager(str(tmp_path)).restore(template)
    assert restored is not None
    jax.tree.map(
        lambda a, b: None
        if jnp.array_equal(a, b)
        else pytest.fail("restored params differ from saved"),
        restored.params,
        _flip_names_for_cmp(saved.params),
    )


def _flip_names_for_cmp(tree):
    from pdunet_tpu.training.checkpoint import _flip_remat_names

    return _flip_remat_names(tree)


def test_best_checkpoint_survives_rotation(tmp_path):
    """The best-val weights must outlive keep-N rotation (ADVICE.md r1:
    best.json alone is metadata, not a policy) and load via infer's path."""
    import json

    from pdunet_tpu.training.checkpoint import CheckpointManager
    from pdunet_tpu.training.loop import build_state
    from pdunet_tpu.training.tasks import build_task

    ckpt_dir = tmp_path / "ckpt"
    config = tiny(get_preset("fbp_unet_parallel"))
    config = dataclasses.replace(
        config,
        train=dataclasses.replace(
            config.train, ckpt_dir=str(ckpt_dir), ckpt_every=10, steps=60,
            eval_every=10, max_checkpoints=2, log_every=20,
        ),
    )
    train(config, verbose=False)
    best = json.loads((ckpt_dir / "best.json").read_text())
    # rotation kept only the last 2 step checkpoints...
    mgr = CheckpointManager(str(ckpt_dir), max_to_keep=2)
    assert mgr.latest_step() == 60
    # ...but the best-step weights survive in the single-slot best manager
    best_mgr = CheckpointManager(str(ckpt_dir / "best"), max_to_keep=1)
    assert best_mgr.latest_step() == best["step"]
    task = build_task(config)
    template = build_state(task)
    restored = best_mgr.restore(template)
    assert int(restored.step) == best["step"]
