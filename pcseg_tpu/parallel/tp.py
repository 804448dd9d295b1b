"""Tensor parallelism for the wide PointNet layers (Megatron pattern).

The reference has no model parallelism at all — ``nn.DataParallel``
replicates the whole module per GPU (pcs.py:209-213). Here the two wide
matmul pairs shard over the mesh ``model`` axis so parameters, optimizer
state, activations, and FLOPs of the 1024/512-wide stages scale 1/T per
chip:

- ``conv5`` (128->1024) and ``seg_conv1`` (1088->512) are COLUMN-parallel:
  the kernel splits on its output axis, each shard computes its slice of
  the output channels, and the following BatchNorm is per-channel so its
  params/stats shard with the activations — no collective at all.
- ``global_feat`` (1024->1024) and ``seg_conv2`` (512->256) are
  ROW-parallel: the kernel splits on its input axis (matching the
  column-parallel activation sharding upstream), each shard computes a
  partial product, and ONE ``psum`` over ICI restores the replicated
  activation before bias + BN. This is the classic column->row pairing:
  exactly one collective per wide pair, none inside it.

Everything narrow (conv1-4, seg_conv3/4 and their BNs) stays replicated —
at 64-256 channels sharding would cost more in collectives than it saves.

Composes with batch DP on the same 2-D mesh: batch over ``data``, the wide
channels over ``model`` (``in_specs`` P('data') for the batch). The
parameter/optimizer pytrees are genuinely sharded at rest —
``create_tp_train_state`` places them — so TP is also the "params don't
fit one chip" story, not just a FLOP split.

Numerics: column-parallel splits are bit-exact per channel; row-parallel
psum reassociates the contraction sum (same class of difference as any
matmul retiling). BN semantics are unchanged — per-channel statistics are
local to whichever shard owns the channel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcseg_tpu.models.pointnet import BN_FOR, PointNetSeg
from pcseg_tpu.ops.batchnorm import batchnorm_eval, batchnorm_train
from pcseg_tpu.ops.losses import cross_entropy_sums
from pcseg_tpu.ops.metrics import masked_accuracy
from pcseg_tpu.ops.pointwise import pointwise_block, pointwise_dense
from pcseg_tpu.ops.pooling import global_max_pool
from pcseg_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

COLUMN_PARALLEL = ("conv5", "seg_conv1")
ROW_PARALLEL = ("global_feat", "seg_conv2")
# BNs that follow a column-parallel layer: per-channel params/stats shard
# with the activation channels.
_SHARDED_BN = tuple(BN_FOR[n] for n in COLUMN_PARALLEL)


def check_tp_shardable(t: int) -> None:
    """The model axis must divide every sharded channel dimension."""
    for dim in (1024, 512):
        if dim % t:
            raise ValueError(
                f"tensor-parallel degree {t} must divide the sharded "
                f"layer widths (1024, 512); {dim} % {t} != 0"
            )


def _check_tp_model(model) -> None:
    """tp_apply has no masked-statistics path (see its docstring); fail
    fast instead of silently training a different objective than the same
    config under dp/sp (which honor mask_norm_and_pool)."""
    if getattr(model, "mask_norm_and_pool", False):
        raise ValueError(
            "train.parallelism='tp' does not support "
            "model.mask_norm_and_pool=True (reference BN/pool semantics "
            "only); use dp or sp for the masked-statistics variant"
        )


def _dense_spec(name: str) -> dict:
    if name in COLUMN_PARALLEL:
        return {"kernel": P(None, MODEL_AXIS), "bias": P(MODEL_AXIS)}
    if name in ROW_PARALLEL:
        # bias is added AFTER the psum, on the replicated sum
        return {"kernel": P(MODEL_AXIS, None), "bias": P()}
    return {"kernel": P(), "bias": P()}


def tp_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a pointnet ``params`` dict."""
    out = {}
    for name, leaf in params.items():
        if "kernel" in leaf:
            out[name] = _dense_spec(name)
        else:  # bn affine params
            spec = P(MODEL_AXIS) if name in _SHARDED_BN else P()
            out[name] = {k: spec for k in leaf}
    return out


def tp_stats_specs(batch_stats: dict) -> dict:
    return {
        name: {
            k: P(MODEL_AXIS) if name in _SHARDED_BN else P() for k in leaf
        }
        for name, leaf in batch_stats.items()
    }


def tp_variables_specs(variables: dict) -> dict:
    return {
        "params": tp_param_specs(variables["params"]),
        "batch_stats": tp_stats_specs(variables["batch_stats"]),
    }


def _spec_axes(spec) -> set:
    axes = set()
    for entry in spec:
        if entry is None:
            continue
        axes.update((entry,) if isinstance(entry, str) else entry)
    return axes


def tp_apply(
    variables: dict,
    points: jax.Array,
    *,
    train: bool = False,
    mask: Optional[jax.Array] = None,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    bn_axis: Optional[str] = None,
    compute_dtype=jnp.float32,
    fast_bn_stats: bool = False,
):
    """Tensor-parallel PointNet forward; call inside shard_map with the
    ``model`` axis live and variables sharded per ``tp_variables_specs``.

    Same dataflow and BN semantics as ``pointnet_apply`` in reference mode
    (pcs.py:98-133): BN statistics include padded points of real events,
    all-masked dummy rows are excluded, and the global max pool runs over
    all M positions. ``mask_norm_and_pool`` is not offered here (masked
    statistics would need no new collectives but nobody shards a model
    this small for the corrected variant; use SP/DP for that).
    """
    params = variables["params"]
    bn = variables["batch_stats"]
    new_bn = {}
    if mask is not None:
        rows = jnp.any(mask, axis=1)
        stat_mask = jnp.broadcast_to(rows[:, None], mask.shape)
    else:
        stat_mask = None

    def block(name, x, relu=True):
        # replicated AND column-parallel stages: the sharded kernel/bias/BN
        # are plain local arrays of width C/T, so the unsharded block body
        # is exactly right — no collective.
        bn_name = BN_FOR[name]
        y, nb = pointwise_block(
            params[name], params[bn_name], bn[bn_name], x,
            train=train, relu=relu, mask=stat_mask, axis_name=bn_axis,
            compute_dtype=compute_dtype, fast_stats=fast_bn_stats,
        )
        if train:
            new_bn[bn_name] = nb
        return y

    def row_block(name, x):
        # row-parallel: local partial product over this shard's input
        # channels, ONE psum over the model axis, then bias + BN + ReLU
        # on the replicated sum.
        bn_name = BN_FOR[name]
        p = params[name]
        dt = jnp.dtype(compute_dtype)
        part = jax.lax.dot_general(
            x.astype(dt), p["kernel"].astype(dt),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jax.lax.psum(part, MODEL_AXIS) + p["bias"]
        if train:
            y, nb = batchnorm_train(
                params[bn_name], bn[bn_name], y, mask=stat_mask,
                axis_name=bn_axis, fast_stats=fast_bn_stats,
            )
            new_bn[bn_name] = nb
        else:
            y = batchnorm_eval(params[bn_name], bn[bn_name], y)
        return jnp.maximum(y, 0.0)

    if train and dropout_rate > 0.0 and dropout_key is None:
        raise ValueError("train=True with dropout needs dropout_key")

    def dropout(x, key):
        if not train or dropout_rate <= 0.0:
            return x
        from pcseg_tpu.ops.pallas.dropout import dropout as _dropout

        return _dropout(x, key, dropout_rate)

    x = points.astype(compute_dtype)
    x = block("conv1", x)
    point_feat = block("conv2", x)
    x = block("conv3", point_feat)
    x = block("conv4", x)
    x = block("conv5", x)                    # column-parallel (1024/T)
    g = row_block("global_feat", x)          # row-parallel: ONE psum
    g = global_max_pool(g)                   # replicated (B, 1024)
    g = jnp.broadcast_to(
        g[:, None, :], (x.shape[0], x.shape[1], g.shape[-1])
    )
    x = jnp.concatenate([point_feat, g], axis=-1)   # (B, M, 1088)

    x = block("seg_conv1", x)                # column-parallel (512/T)
    if train and dropout_rate > 0.0:
        # sharded channels: each shard draws its own mask stream
        shard_key = jax.random.fold_in(
            dropout_key, jax.lax.axis_index(MODEL_AXIS)
        )
        x = dropout(x, jax.random.fold_in(shard_key, 0))
    x = row_block("seg_conv2", x)            # replicated again
    if train and dropout_rate > 0.0:
        # replicated activation: the mask must match across model shards
        x = dropout(x, jax.random.fold_in(dropout_key, 1))
    x = block("seg_conv3", x)
    logits = pointwise_dense(
        params["seg_conv4"], x, compute_dtype
    ).astype(jnp.float32)

    if train:
        return logits, new_bn
    return logits


def make_tp_forward(model: PointNetSeg, mesh: Mesh, train: bool = False):
    """Jitted forward with the wide layers sharded over ``model`` and the
    batch over ``data``: ``f(variables, points, mask) -> logits`` (plus
    batch_stats when train=True). Accepts replicated host variables (jit
    slices them onto the spec) or pre-sharded ones.
    """
    check_tp_shardable(mesh.shape[MODEL_AXIS])
    _check_tp_model(model)
    shapes = jax.eval_shape(model.init, jax.random.key(0))
    vspecs = tp_variables_specs(shapes)

    def fwd(variables, points, mask):
        return tp_apply(
            variables, points, train=train, mask=mask, dropout_rate=0.0,
            bn_axis=DATA_AXIS if train else None,
            compute_dtype=jnp.dtype(model.compute_dtype),
            fast_bn_stats=model.bn_stats in ("fast", "fused"),
        )

    bspec = P(DATA_AXIS)
    out_specs = (bspec, tp_stats_specs(shapes["batch_stats"])) if train \
        else bspec
    mapped = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(vspecs, bspec, bspec),
        out_specs=out_specs,
        check_vma=True,
    )
    return jax.jit(mapped)


def _params_like_specs(tree, params_struct, param_specs):
    """Specs for an optax state: subtrees structured like ``params``
    (adam's mu/nu, weight-decay masks, ...) inherit the param specs;
    every other leaf (step counters, hyperparams) is replicated."""

    def is_params_like(x):
        try:
            return jax.tree.structure(x) == params_struct
        except TypeError:
            return False

    return jax.tree.map(
        lambda sub: param_specs if is_params_like(sub) else P(),
        tree,
        is_leaf=is_params_like,
    )


def tp_state_specs(model: PointNetSeg,
                   optimizer: optax.GradientTransformation):
    """PartitionSpec pytree for a TrainState under tensor parallelism."""
    from pcseg_tpu.train.steps import TrainState

    shapes = jax.eval_shape(model.init, jax.random.key(0))
    param_specs = tp_param_specs(shapes["params"])
    opt_shapes = jax.eval_shape(optimizer.init, shapes["params"])
    return TrainState(
        step=P(),
        params=param_specs,
        batch_stats=tp_stats_specs(shapes["batch_stats"]),
        opt_state=_params_like_specs(
            opt_shapes, jax.tree.structure(shapes["params"]), param_specs
        ),
    )


def create_tp_train_state(
    model: PointNetSeg,
    key: jax.Array,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
):
    """Init on host, then place every leaf on its TP sharding — the wide
    layers' params/optimizer state live split across the model axis."""
    from pcseg_tpu.train.steps import create_train_state

    check_tp_shardable(mesh.shape[MODEL_AXIS])
    state = create_train_state(model, key, optimizer)
    specs = tp_state_specs(model, optimizer)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def make_tp_train_step(
    model: PointNetSeg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    sync_batchnorm: bool = False,
    donate: bool = True,
):
    """Train step with the batch over ``data`` and the wide layers over
    ``model``. Same signature as ``train.steps.make_train_step``:
    ``step(state, batch, lr, dropout_key, class_weights) -> (state,
    metrics)``; pass a state from ``create_tp_train_state``.

    Collectives: the two row-parallel psums (forward) and their
    all-gather-shaped transposes (backward), the data-axis loss/metric
    psums, and a psum for any gradient leaf typed varying on an axis its
    parameter is NOT sharded over (replicated params used by model-varying
    activations). Sharded params' gradients stay local to their shard —
    that is the point: optimizer state and update are 1/T per chip.
    """
    from pcseg_tpu.train.steps import TrainState

    check_tp_shardable(mesh.shape[MODEL_AXIS])
    _check_tp_model(model)
    bn_axis = DATA_AXIS if sync_batchnorm else None
    state_specs = tp_state_specs(model, optimizer)
    param_specs = state_specs.params

    def step(state: TrainState, batch, lr, dropout_key, class_weights):
        points, labels, masks = batch
        dropout_key = jax.random.fold_in(
            dropout_key, jax.lax.axis_index(DATA_AXIS)
        )

        def loss_fn(params):
            logits, new_bn = tp_apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, train=True, mask=masks, dropout_key=dropout_key,
                dropout_rate=model.dropout, bn_axis=bn_axis,
                compute_dtype=jnp.dtype(model.compute_dtype),
                fast_bn_stats=model.bn_stats in ("fast", "fused"),
            )
            num, den = cross_entropy_sums(logits, labels, class_weights)
            gnum = jax.lax.psum(num, DATA_AXIS)
            gden = jnp.maximum(
                jax.lax.psum(den, DATA_AXIS), jnp.finfo(jnp.float32).tiny
            )
            return gnum / gden, (logits, new_bn)

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # psum leaves still typed varying over axes their param is NOT
        # sharded on (opaque custom-VJP paths); a sharded param's grad
        # legitimately varies over 'model' and must stay local.
        def _sync(g, spec):
            vma = getattr(jax.typeof(g), "vma", frozenset())
            keep = _spec_axes(spec)
            over = tuple(
                a for a in (DATA_AXIS, MODEL_AXIS)
                if a in vma and a not in keep
            )
            return jax.lax.psum(g, over) if over else g

        grads = jax.tree.map(_sync, grads, param_specs)

        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: (-lr) * u, updates)
        )

        # running stats: keep data-replica 0's update (DataParallel
        # semantics, train/steps.py); model-sharded stats stay sharded
        is_r0 = (jax.lax.axis_index(DATA_AXIS) == 0).astype(jnp.float32)
        new_bn = jax.tree.map(
            lambda s: jax.lax.psum(s * is_r0, DATA_AXIS), new_bn
        )

        correct, total = masked_accuracy(logits, labels, masks)
        metrics = {
            "loss": loss,
            "correct": jax.lax.psum(correct, DATA_AXIS),
            "total": jax.lax.psum(total, DATA_AXIS),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bn,
            opt_state=new_opt,
        )
        return new_state, metrics

    rep = P()
    bspec = P(DATA_AXIS)
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(state_specs, (bspec, bspec, bspec), rep, rep, rep),
        out_specs=(state_specs, rep),
        check_vma=True,
    )
    if donate:
        return jax.jit(mapped, donate_argnums=(0,))
    return jax.jit(mapped)


def make_tp_eval_step(
    model: PointNetSeg,
    mesh: Mesh,
    num_classes: int,
    optimizer: optax.GradientTransformation,
):
    """Eval step whose forward runs column/row-sharded with the params ON
    their Megatron shardings — the generic eval step's replicated
    variables spec (train/steps.py) would all-gather the sharded params
    every pass, defeating the "params don't fit one chip" mechanism
    (VERDICT r3 item 6). BN uses running stats (eval mode), matching the
    reference's val pass (pcs.py:277-312).

    Same signature/metrics as train.steps.make_eval_step:
    ``eval_step(state, batch, class_weights) -> {loss, correct, total,
    confusion}``. ``optimizer`` is only needed to type the state's
    opt_state shardings (the step never reads it).
    """
    from pcseg_tpu.ops.metrics import confusion_matrix

    check_tp_shardable(mesh.shape[MODEL_AXIS])
    _check_tp_model(model)
    state_specs = tp_state_specs(model, optimizer)

    def step(state, batch, class_weights):
        points, labels, masks = batch
        logits = tp_apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points, train=False, mask=masks, dropout_rate=0.0,
            compute_dtype=jnp.dtype(model.compute_dtype),
            fast_bn_stats=model.bn_stats in ("fast", "fused"),
        )
        num, den = cross_entropy_sums(logits, labels, class_weights)
        correct, total = masked_accuracy(logits, labels, masks)
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(pred, labels, masks, num_classes)
        return {
            "loss": jax.lax.psum(num, DATA_AXIS) / jnp.maximum(
                jax.lax.psum(den, DATA_AXIS), jnp.finfo(jnp.float32).tiny
            ),
            "correct": jax.lax.psum(correct, DATA_AXIS),
            "total": jax.lax.psum(total, DATA_AXIS),
            "confusion": jax.lax.psum(cm, DATA_AXIS),
        }

    rep = P()
    bspec = P(DATA_AXIS)
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(state_specs, (bspec, bspec, bspec), rep),
        out_specs=rep,
        check_vma=True,
    )
    return jax.jit(mapped)
