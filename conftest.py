# Root conftest: makes the repo root importable under pytest and forces all
# tests onto CPU (the TPU is single-client — SURVEY.md §0 — so test suites
# must never touch the chip while training/benching might).
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
