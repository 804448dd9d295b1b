"""Accelerator bring-up helpers.

The reference selects its device once at module scope (pcs.py:14-18) and
assumes it stays up. This environment's real-TPU backend is reached over
a tunnel with transient outages (init hangs or raises UNAVAILABLE), so
the driver-facing surfaces (bench.py, __graft_entry__) probe it to
health — in a subprocess, because JAX caches a failed backend init for
the life of the process — before committing their own process to it.
"""

from __future__ import annotations

import subprocess
import sys
import time


def _cpu_forced() -> bool:
    """True when this process's JAX is pinned to the host platform.

    Only the HIGHEST-PRIORITY platform counts: the axon plugin
    registers itself as "axon,cpu" (cpu as fallback), which must not
    read as CPU-pinned — that misread silently disabled the persistent
    compile cache on every real-TPU process (r5: 20-minute Mosaic
    recompiles on each bench run)."""
    try:
        import jax

        plats = str(jax.config.jax_platforms or "")
    except Exception:
        return False
    return plats.split(",")[0].strip() == "cpu"


def wait_for_backend(max_wait_s: float = 600.0, poll_s: float = 20.0) -> bool:
    """Block (bounded) until a subprocess can initialize JAX devices.

    Returns True when a probe succeeded, False on timeout (callers then
    proceed and let the real init surface the real error). No-op cost
    when healthy: one ~2 s subprocess.
    """
    if _cpu_forced():
        # caller forced the host platform (tests / dryrun bootstrap) —
        # it cannot be "down"; don't probe the accelerator tunnel
        return True
    deadline = time.monotonic() + max_wait_s
    probe = "import jax; jax.devices()"
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=120,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        time.sleep(poll_s)
