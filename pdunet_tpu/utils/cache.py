"""Persistent XLA compilation cache (SURVEY.md §0: cold compiles on the
axon TPU cost 15-180 s each and go through a remote-compile relay, so every
entry point enables the on-disk cache by default)."""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(directory: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory."""
    import jax

    directory = directory or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # cache everything, however small — remote compiles have high fixed cost
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return directory
