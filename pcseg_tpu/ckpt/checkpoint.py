"""Checkpoint save/restore.

Mirrors the reference's saved dict (pcs.py:373-382): epoch, model state,
optimizer state, train/val loss, f1_class2, f1_per_class, num_classes —
and adds what the reference lacks (SURVEY.md §5): a true mid-training
resume path (the reference saves optimizer state but never loads it,
pcs.py:376 vs :401-430).

Format: one directory per checkpoint containing
- ``state.msgpack`` — the {params, batch_stats, opt_state, step} pytree
  (flax msgpack serialization; pure arrays, no pickle — unlike the
  reference's ``torch.load(weights_only=False)`` pickle hazard, pcs.py:401)
- ``meta.json``     — metrics + config metadata.

Writes are atomic (write to ``<dir>.tmp`` then rename) so a preempted save
never corrupts the best checkpoint — the failure-recovery story for long
TPU runs.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None) -> None:
    """Atomically write ``state`` (any pytree) + metadata to directory ``path``."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_to_host(state)))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, default=float)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None) -> tuple[Any, dict]:
    """Load (state, metadata). ``target`` provides the pytree structure;
    if None, returns the raw nested-dict form."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    state = (
        serialization.from_bytes(target, data)
        if target is not None
        else serialization.msgpack_restore(data)
    )
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
