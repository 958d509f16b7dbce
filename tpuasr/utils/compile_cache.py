"""Persistent XLA compilation cache for the CLI entry points.

First compilation of the flagship train step or a batched streaming decode
takes 20 s – minutes (much longer when the shared chip is contended); the
reference has no analog (TorchScript tracing is its closest artifact). With
the cache enabled, repeat invocations of any tool with the same shapes and
config reload the compiled executable from disk instead of recompiling.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "tpuasr", "xla",
)


def enable_stack_dumps() -> None:
    """SIGUSR1 dumps every thread's Python stack to stderr (hung-RPC triage
    on the tunneled chip: `kill -USR1 <pid>` is non-fatal)."""
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError, OSError):
        pass  # non-main thread / platform without SIGUSR1


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 2.0) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or None if the runtime lacks support or the
    directory cannot be created (callers proceed without a cache)."""
    import jax

    path = cache_dir or os.environ.get("TPUASR_COMPILE_CACHE", DEFAULT_DIR)
    if path in ("", "off", "none"):
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist compilations that are worth the disk round-trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        # cache regardless of how often a program is hit
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return path
