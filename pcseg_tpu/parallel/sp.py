"""Point-axis sharding — the sequence-parallel analog for point clouds.

The reference's only long-input mechanism is pad-to-batch-max
(pcs.py:44-63); events that don't fit one chip's memory have no story.
Here the POINT axis shards across the mesh ``model`` axis (SURVEY.md §5's
"honest context-parallel equivalent"): every network op is pointwise
except the global max pool (``pmax`` over ICI) and BN batch statistics
(``psum``), so activations, memory, and FLOPs all scale 1/P per chip while
numerics match the unsharded forward exactly.

Composes with batch DP: points (B, M, D) sharded P('data', 'model').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pcseg_tpu.models.pointnet import PointNetSeg, pointnet_apply
from pcseg_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_sp_forward(model: PointNetSeg, mesh: Mesh, train: bool = False):
    """Jitted forward with points sharded over (data, model) mesh axes.

    Returns ``f(variables, points, mask) -> logits`` (plus batch_stats when
    train=True); ``points`` (B, M, D) with B divisible by the data axis and
    M by the model axis. BN uses batch stats synced over the point shards
    (and per-replica over data, matching DataParallel semantics).
    """

    def fwd(variables, points, mask):
        return pointnet_apply(
            variables,
            points,
            train=train,
            mask=mask,
            dropout_rate=0.0,
            mask_norm_and_pool=model.mask_norm_and_pool,
            # full-batch statistics: synced over the data axis too (the
            # returned batch_stats must be mesh-replicated)
            axis_name=DATA_AXIS if train else None,
            point_axis_name=MODEL_AXIS,
            compute_dtype=jnp.dtype(model.compute_dtype),
            fast_bn_stats=model.bn_stats in ("fast", "fused"),
        )

    shd = P(DATA_AXIS, MODEL_AXIS)
    out_specs = (shd, P()) if train else shd
    mapped = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), shd, shd),
        out_specs=out_specs,
        check_vma=True,
    )
    return jax.jit(mapped)
