"""Persistent XLA compilation cache.

Remote-compile latency on tunneled TPU environments is minutes-scale and
flaky; the persistent cache turns every repeat compile (same program, any
process) into a ~70 ms disk read. Enabled by the CLI/bench entry points;
set ``PCSEG_COMPILE_CACHE=0`` to disable or point ``PCSEG_COMPILE_CACHE``
at a custom directory.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/pcseg_tpu/xla")


def enable_compilation_cache() -> str | None:
    """Idempotently enable the cache; returns the directory (or None)."""
    import jax

    setting = os.environ.get("PCSEG_COMPILE_CACHE", "")
    if setting == "0":
        return None
    from pcseg_tpu.core.runtime import _cpu_forced

    if _cpu_forced():
        # CPU-pinned process (tests / dryrun bootstrap / driver CPU mesh):
        # CPU compiles are cheap, and loading CPU AOT entries written on
        # a DIFFERENT host machine-feature set risks SIGILL (observed
        # "+prefer-no-scatter not supported on the host machine"
        # warnings) — cache accelerator programs only.
        return None
    cache_dir = setting if setting not in ("", "1") else _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
