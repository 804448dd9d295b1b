"""Global pooling over the point axis.

The reference's single cross-point op: ``torch.max(feat, dim=2)`` global max
pool (pcs.py:114). Parity note: the reference pools over ALL M positions
including zero-padding; with post-ReLU (>=0) features the padded columns
contribute their BN-shifted ReLU outputs, which is part of the reference's
numerics. ``mask=None`` reproduces that; a mask enables the corrected
variant that pools only valid points.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def global_max_pool(
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    point_axis_name: Optional[str] = None,
) -> jax.Array:
    """(B, M, C) -> (B, C) max over points; optionally only valid points.

    ``point_axis_name``: when the point axis is sharded across a mesh axis
    (the sequence-parallel analog for huge events, SURVEY.md §5), the local
    max is pmax-combined across shards over ICI.
    """
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, x.dtype)
        x = jnp.where(mask[..., None], x, neg)
    out = jnp.max(x, axis=1)
    if point_axis_name is not None:
        # differentiable cross-shard max: pmax has no VJP, so gather the
        # per-shard maxima (tiny (B, C) arrays) and reduce — the max VJP
        # then routes gradient to the winning shard through all_gather's
        # transpose
        gathered = jax.lax.all_gather(out, point_axis_name, axis=0)
        out = jnp.max(gathered, axis=0)
    return out
