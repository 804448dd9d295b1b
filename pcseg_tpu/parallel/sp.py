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

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from pcseg_tpu.models.pointnet import PointNetSeg, pointnet_apply
from pcseg_tpu.ops.losses import cross_entropy_sums
from pcseg_tpu.ops.metrics import masked_accuracy
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


def make_sp_train_step(
    model: PointNetSeg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    sync_batchnorm: bool = False,
    donate: bool = True,
):
    """Train step with the batch over ``data`` AND points over ``model``.

    The full sequence-parallel training path (SURVEY.md §5): per-shard
    activations/FLOPs scale 1/(data*model); collectives are the BN-stat
    psum + pool pmax over the point shards (forward), the psum transpose
    of the replicated loss (backward — JAX inserts the gradient allreduce
    over BOTH mesh axes), and the metric psums.

    Same signature and semantics as ``train.steps.make_train_step``:
    ``step(state, batch, lr, dropout_key, class_weights) -> (state,
    metrics)``; batch dims (B, M) divisible by (data, model) axis sizes.
    BN batch statistics always sync over the point shards (required for
    correctness: a point shard sees only part of every event);
    ``sync_batchnorm`` additionally syncs them over ``data``. Running
    stats keep the data-replica-0 update (DataParallel semantics,
    train/steps.py).
    """
    from pcseg_tpu.train.steps import TrainState

    bn_axis = DATA_AXIS if sync_batchnorm else None
    both = (DATA_AXIS, MODEL_AXIS)

    def step(state: TrainState, batch, lr, dropout_key, class_weights):
        points, labels, masks = batch
        # independent dropout per (data, model) shard
        lin = (
            jax.lax.axis_index(DATA_AXIS) * jax.lax.axis_size(MODEL_AXIS)
            + jax.lax.axis_index(MODEL_AXIS)
        )
        dropout_key = jax.random.fold_in(dropout_key, lin)

        def loss_fn(params):
            logits, new_bn = pointnet_apply(
                {"params": params, "batch_stats": state.batch_stats},
                points,
                train=True,
                mask=masks,
                dropout_key=dropout_key,
                dropout_rate=model.dropout,
                mask_norm_and_pool=model.mask_norm_and_pool,
                axis_name=bn_axis,
                point_axis_name=MODEL_AXIS,
                compute_dtype=jnp.dtype(model.compute_dtype),
                fast_bn_stats=model.bn_stats in ("fast", "fused"),
            )
            num, den = cross_entropy_sums(logits, labels, class_weights)
            gnum = jax.lax.psum(num, both)
            gden = jnp.maximum(
                jax.lax.psum(den, both), jnp.finfo(jnp.float32).tiny
            )
            return gnum / gden, (logits, new_bn)

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # psum any leaf still typed varying over a mesh axis (opaque
        # custom-VJP paths); replicated leaves pass through (train/steps.py)
        def _sync(g):
            vma = getattr(jax.typeof(g), "vma", frozenset())
            axes = tuple(a for a in both if a in vma)
            return jax.lax.psum(g, axes) if axes else g

        grads = jax.tree.map(_sync, grads)

        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: (-lr) * u, updates)
        )

        # running stats: keep data-replica 0's update (already invariant
        # over the model axis — BN stats psum over point shards)
        is_r0 = (jax.lax.axis_index(DATA_AXIS) == 0).astype(jnp.float32)
        new_bn = jax.tree.map(
            lambda s: jax.lax.psum(s * is_r0, DATA_AXIS), new_bn
        )

        correct, total = masked_accuracy(logits, labels, masks)
        metrics = {
            "loss": loss,
            "correct": jax.lax.psum(correct, both),
            "total": jax.lax.psum(total, both),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bn,
            opt_state=new_opt,
        )
        return new_state, metrics

    rep = P()
    shd = P(DATA_AXIS, MODEL_AXIS)
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, (shd, shd, shd), rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=True,
    )
    if donate:
        return jax.jit(mapped, donate_argnums=(0,))
    return jax.jit(mapped)
