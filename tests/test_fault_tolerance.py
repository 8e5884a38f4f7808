"""Failure detection / recovery (SURVEY.md §5.3): a training process killed
mid-run resumes from the last checkpoint and completes via train.py's
auto-resume — the idiomatic version of the reference's manual
resume-from-Lightning-checkpoint contract."""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

ARGS = [
    "--preset", "fbp_unet_parallel", "--platform", "cpu",
    "--set", "geometry.image_size=32", "--set", "geometry.n_angles=40",
    "--set", "model.base_features=8", "--set", "model.depth=2",
    "--set", "train.batch_size=2", "--set", "train.log_every=5",
    "--set", "train.warmup_steps=5", "--set", "train.ckpt_every=10",
    "--set", "train.eval_every=1000", "--steps", "60",
]


def _launch(ckpt_dir, metrics):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.Popen(
        [sys.executable, str(REPO / "train.py"), *ARGS,
         "--ckpt-dir", str(ckpt_dir), "--metrics", str(metrics)],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


@pytest.mark.slow
def test_sigkill_and_resume(tmp_path):
    ckpt = tmp_path / "ckpt"
    metrics = tmp_path / "metrics.jsonl"

    # run 1: kill hard once the first checkpoint exists
    proc = _launch(ckpt, metrics)
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            steps = [p for p in ckpt.glob("[0-9]*")
                     if p.is_dir() and p.name.isdigit()]
            if steps and metrics.exists() and metrics.stat().st_size > 0:
                break
            if proc.poll() is not None:
                pytest.fail("training exited before producing a checkpoint")
            time.sleep(0.5)
        else:
            pytest.fail("no checkpoint appeared within timeout")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # a half-written *.orbax-checkpoint-tmp dir may exist — the kill can land
    # mid-save; restore must ignore it (orbax does)
    killed_at = max(
        int(p.name) for p in ckpt.glob("[0-9]*")
        if p.is_dir() and p.name.isdigit()
    )
    assert killed_at < 60

    # run 2: plain restart with --resume auto (the default) completes
    proc2 = _launch(ckpt, metrics)
    assert proc2.wait(timeout=300) == 0

    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    steps_logged = [l["step"] for l in lines if "step" in l]
    assert max(steps_logged) == 60
    # the resumed run continued from the checkpoint, not from scratch
    assert any(s > killed_at for s in steps_logged)
