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

_MARKER = "HOST_SIGNATURE"


def _host_signature() -> str:
    """Richer host identity than `_host_fingerprint`: adds model/stepping and
    the kernel's `bugs` line. Two build-round hosts were observed with
    *identical* cpuinfo flags (same virtualized "Intel Xeon @ 2.10GHz") yet
    different LLVM tuning features (`+prefer-no-gather` et al., which track
    mitigation state, not flags) — so flags alone under-segregate. The bugs
    line captures mitigation differences (e.g. gather_data_sampling) that
    drive those tuning choices."""
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "flags", "bugs")
    parts: list[str] = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip() and parts:
                    break  # first processor block only
                key = line.split(":", 1)[0].strip()
                if key in keys:
                    parts.append(" ".join(line.split()))
    except OSError:
        import platform

        parts = [platform.processor()]
    # cpuinfo's `bugs` line names bugs but not their mitigation *status*,
    # and the status is what flips LLVM tuning prefs like +prefer-no-gather
    # (observed in round 4: identical cpuinfo across session hosts, yet the
    # AOT loader still reported a tuning-feature mismatch). The kernel's
    # per-vulnerability files carry the status explicitly.
    vuln_dir = "/sys/devices/system/cpu/vulnerabilities"
    try:
        for name in sorted(os.listdir(vuln_dir)):
            try:
                with open(os.path.join(vuln_dir, name)) as f:
                    parts.append(f"vuln {name}: {f.read().strip()}")
            except OSError:
                pass
    except OSError:
        pass
    return hashlib.sha256("\n".join(sorted(parts)).encode()).hexdigest()[:16]


def _adopt_or_rotate(directory: str) -> str:
    """Keep `directory` only if its marker matches this host; else move it
    aside and start fresh. A missing marker (dir predates this check, or
    fresh dir) is adopted and stamped — callers on the writing host keep
    their warm cache; a *future* host with a different signature rotates."""
    sig = _host_signature()
    marker = os.path.join(directory, _MARKER)
    try:
        with open(marker) as f:
            old = f.read().strip()
    except OSError:
        old = None
    if old is not None and old != sig:
        stale = f"{directory}.stale-{old[:8]}"
        try:
            os.rename(directory, stale)
        except OSError:
            pass  # lost a rotation race — the winner already moved it
        os.makedirs(directory, exist_ok=True)
    if old != sig:
        tmp = f"{marker}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(sig + "\n")
        os.replace(tmp, marker)
    return directory


def enable_compilation_cache(directory: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory."""
    import jax

    directory = directory or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    _adopt_or_rotate(directory)
    jax.config.update("jax_compilation_cache_dir", directory)
    # cache everything, however small — remote compiles have high fixed cost
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return directory
