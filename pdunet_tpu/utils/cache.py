"""Persistent XLA compilation cache (SURVEY.md §0: cold compiles on the
axon TPU cost 15-180 s each and go through a remote-compile relay, so every
entry point enables the on-disk cache by default)."""

from __future__ import annotations

import hashlib
import os

_BASE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU cache entries are AOT machine code for the *compiling* host's
    exact feature set, and the cache key does NOT include it — a cache dir
    carried to a machine with different features (observed across build
    rounds: 'Target machine feature +prefer-no-gather is not supported on
    the host machine … could lead to execution errors such as SIGILL')
    loads wrong code. Segregating the directory per host-feature-set makes
    stale entries unreachable instead of dangerous."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:10]


DEFAULT_DIR = f"{_BASE_DIR}-{_host_fingerprint()}"


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
