"""Shared utilities: compilation cache, profiling hooks, debug flags."""

from pdunet_tpu.utils.cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
