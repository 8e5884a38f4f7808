"""Shared utilities: compilation cache, profiling hooks, debug flags."""

from pdunet_tpu.utils.cache import enable_compilation_cache
from pdunet_tpu.utils.device import materialize
from pdunet_tpu.utils import watchdog

__all__ = ["enable_compilation_cache", "materialize", "watchdog"]
