"""Observability: tracing, step timing, structured metrics logging.

The reference's entire observability story is tqdm postfixes and prints
(pcs.py:235, 268-271, 351-357) — no profiler, no structured records
(SURVEY.md §5). Here:

- ``profile_trace``: context manager around ``jax.profiler`` — dumps an
  XLA/TPU trace viewable in TensorBoard/Perfetto (gated: tunneled or CPU
  backends without profiler support degrade to a no-op with a warning);
- ``named_scope``: re-export of ``jax.named_scope`` for labeling model
  stages (voxelize / encoder / head) inside traces;
- ``StepTimer``: wall-clock per-step EMA without forcing device syncs
  (reads are only taken at epoch boundaries);
- ``MetricsLogger``: JSONL metrics stream (one record per epoch/step) —
  greppable, plottable, and diffable across runs; optional TensorBoard
  writer if ``tensorboardX``/``torch.utils.tensorboard`` is importable.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import warnings
from typing import Any, Optional

import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (no-op on failure)."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # tunneled/virtual backends may not support it
        warnings.warn(f"jax.profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Exponential-moving-average step timer (host wall clock)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                (1 - self.alpha) * self.ema + self.alpha * dt
            )
        self._last = now

    @property
    def ms(self) -> Optional[float]:
        return None if self.ema is None else self.ema * 1e3


class MetricsLogger:
    """Append-only JSONL metrics + optional TensorBoard scalars."""

    def __init__(self, path: Optional[str] = None, tensorboard_dir: str = ""):
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception as e:
                warnings.warn(f"tensorboard writer unavailable: {e}")

    def log(self, step: int, record: dict[str, Any]) -> None:
        rec = {"step": step, "time": time.time(), **record}
        if self._fh:
            self._fh.write(json.dumps(rec, default=float) + "\n")
        if self._tb:
            for k, v in record.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
