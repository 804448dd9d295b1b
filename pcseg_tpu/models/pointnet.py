"""PointNetSeg — the reference's segmentation network, TPU-native.

Architecture contract (reference ``PointNetSegmentation``, pcs.py:65-133;
full spec SURVEY.md §2.2): shared per-point MLPs
4->64->64->64->128->1024, a 1024->1024 "global feature" stage, a global max
pool over points, broadcast + concat with the 64-ch skip (= 1088 channels),
then head 1088->512->256->128->num_classes with dropout 0.3 after the first
two head stages; BN+ReLU everywhere except the final logits layer.

Differences from the reference that are design, not behavior:
- activations are channels-last ``(B, M, C)`` (MXU-friendly) instead of
  torch's ``(B, C, M)`` — no transposes anywhere (reference transposes at
  pcs.py:103/131);
- parameters are a plain pytree, so pjit shardings, the ``best_model.pth``
  importer (ckpt/torch_import.py) and Pallas fusions address them directly;
- the whole forward is one traced function: XLA fuses each BN+ReLU into the
  preceding matmul's epilogue.

Behavioral parity (defaults reproduce reference numerics exactly):
- BN statistics include zero-padded positions (pcs.py:53 + :106-127);
- the global max pool runs over all M positions including padding
  (pcs.py:114);
- ``mask_norm_and_pool=True`` opts into the masked/corrected variants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.batchnorm import bn_param_init, bn_state_init
from pcseg_tpu.ops.pointwise import dense_init, pointwise_block, pointwise_dense
from pcseg_tpu.ops.pooling import global_max_pool

# (name, in_dim, out_dim) for every parameterized stage, in forward order.
# Mirrors the reference layer table (pcs.py:70-83); 'conv2' output is the
# skip feature, 'seg4' has no BN/ReLU.
ENCODER = [
    ("conv1", 4, 64),
    ("conv2", 64, 64),
    ("conv3", 64, 64),
    ("conv4", 64, 128),
    ("conv5", 128, 1024),
]
GLOBAL = ("global_feat", 1024, 1024)
HEAD = [
    ("seg_conv1", 1088, 512),   # 1088 = 64 skip + 1024 global (pcs.py:80)
    ("seg_conv2", 512, 256),
    ("seg_conv3", 256, 128),
]
# BN state names follow the reference's bn naming (pcs.py:86-94).
BN_FOR = {
    "conv1": "bn1",
    "conv2": "bn2",
    "conv3": "bn3",
    "conv4": "bn4",
    "conv5": "bn5",
    "global_feat": "bn_global",
    "seg_conv1": "bn_seg1",
    "seg_conv2": "bn_seg2",
    "seg_conv3": "bn_seg3",
}

DROPOUT_RATE = 0.3  # pcs.py:96

_warned_fused_fallback = False


def _warn_fused_fallback(msg: str) -> None:
    global _warned_fused_fallback
    if not _warned_fused_fallback:
        import warnings

        warnings.warn(msg, stacklevel=3)
        _warned_fused_fallback = True


@dataclasses.dataclass(frozen=True)
class PointNetSeg:
    """Static model hyperparameters (a hashable jit-friendly spec).

    ``bn_stats="fused"`` semantics (the whole-chain Pallas path,
    models/pointnet_fused.py): BN statistics are computed over ALL rows of
    the padded batch — reference behavior for point padding (pcs.py:53 +
    :106-127), but unlike the XLA path it also includes fully-masked DUMMY
    rows (batch-dim padding of a short final batch; ~one batch per epoch).
    Incompatible combinations fail fast instead of silently degrading:
    ``mask_norm_and_pool=True`` raises (masked statistics are not fused),
    and cross-device BN (sync-BN / point-axis sharding) warns once per
    process when it forces the XLA fallback.
    """

    num_classes: int
    input_dim: int = 4
    dropout: float = DROPOUT_RATE
    mask_norm_and_pool: bool = False
    compute_dtype: str = "float32"
    # "exact" = torch-bit-parity two-pass batch variance; "fast" =
    # single-pass E[x^2]-mu^2 (~15% faster steps, ~1e-6 relative
    # difference in normalized outputs); "fused" = whole-chain Pallas
    # kernels (TPU train mode; see class docstring for semantics)
    bn_stats: str = "exact"

    def __post_init__(self):
        if self.bn_stats == "fused" and self.mask_norm_and_pool:
            raise ValueError(
                "bn_stats='fused' computes statistics over all padded "
                "positions and cannot honor mask_norm_and_pool=True; use "
                "bn_stats='exact'/'fast' for masked statistics"
            )

    def init(self, key: jax.Array) -> dict:
        return pointnet_init(key, self.num_classes, self.input_dim)

    def supports_fused_loss(self) -> bool:
        """True when the whole-chain fused path INCLUDING the classifier+CE
        kernel (ops/pallas/fused_ce.py) can drive training on this
        backend. Cross-device BN configs are excluded the same way
        ``apply`` excludes them (per-replica stats only)."""
        return (
            self.bn_stats == "fused"
            and not self.mask_norm_and_pool
            and jax.default_backend() == "tpu"
        )

    def fused_train_loss(
        self, variables, points, labels, class_weights, *, dropout_key
    ):
        """((num, den, correct), new_batch_stats) — see
        models/pointnet_fused.pointnet_fused_train_loss. Caller must hold
        the framework's padding contract: labels == -1 exactly at masked
        positions (data/batching.py)."""
        from pcseg_tpu.models.pointnet_fused import pointnet_fused_train_loss

        return pointnet_fused_train_loss(
            variables, points, labels, class_weights,
            dropout_key=dropout_key, dropout_rate=self.dropout,
        )

    def apply(self, variables, points, **kw):
        if self.bn_stats == "fused" and kw.get("train"):
            cross_device = (
                kw.get("axis_name") is not None
                or kw.get("point_axis_name") is not None
            )
            if cross_device:
                _warn_fused_fallback(
                    "sync-BN / point-axis sharding needs cross-device "
                    "statistics; bn_stats='fused' falls back to the XLA "
                    "path (single-pass stats) for this configuration"
                )
            elif (jax.default_backend() == "tpu"
                  and points.shape[1] % 8 != 0):
                _warn_fused_fallback(
                    "the fused kernels tile the point axis in multiples "
                    f"of 8; M={points.shape[1]} falls back to the XLA "
                    "path (pick bucket sizes that are multiples of 8 to "
                    "stay fused)"
                )
            elif jax.default_backend() == "tpu":
                # whole-chain fused Pallas path (models/pointnet_fused.py)
                from pcseg_tpu.models.pointnet_fused import (
                    pointnet_apply_fused,
                )

                return pointnet_apply_fused(
                    variables,
                    points,
                    dropout_key=kw.get("dropout_key"),
                    dropout_rate=self.dropout,
                )
        return pointnet_apply(
            variables,
            points,
            dropout_rate=self.dropout,
            mask_norm_and_pool=self.mask_norm_and_pool,
            compute_dtype=jnp.dtype(self.compute_dtype),
            fast_bn_stats=self.bn_stats in ("fast", "fused"),
            **kw,
        )


def pointnet_init(key: jax.Array, num_classes: int, input_dim: int = 4) -> dict:
    """Build {params, batch_stats} pytrees with torch-default init."""
    if num_classes < 1:
        raise ValueError("num_classes must be >= 1")
    stages = list(ENCODER) + [GLOBAL] + list(HEAD) + [
        ("seg_conv4", 128, num_classes)
    ]
    stages[0] = ("conv1", input_dim, 64)
    keys = jax.random.split(key, len(stages))
    params, batch_stats = {}, {}
    for k, (name, din, dout) in zip(keys, stages):
        params[name] = dense_init(k, din, dout)
        bn_name = BN_FOR.get(name)
        if bn_name is not None:
            params[bn_name] = bn_param_init(dout)
            batch_stats[bn_name] = bn_state_init(dout)
    return {"params": params, "batch_stats": batch_stats}


def pointnet_apply(
    variables: dict,
    points: jax.Array,
    *,
    train: bool = False,
    mask: Optional[jax.Array] = None,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = DROPOUT_RATE,
    mask_norm_and_pool: bool = False,
    axis_name: Optional[str] = None,
    point_axis_name: Optional[str] = None,
    compute_dtype=jnp.float32,
    fast_bn_stats: bool = False,
):
    """Forward pass.

    points: (B, M, input_dim). Returns logits (B, M, num_classes) f32;
    when ``train=True``, returns ``(logits, new_batch_stats)``.
    Reference dataflow: pcs.py:98-133.

    ``point_axis_name``: mesh axis the POINT dimension is sharded over
    (sequence-parallel analog for huge events): BN statistics psum across
    it and the global max pool pmax-combines — numerics identical to the
    unsharded forward.
    """
    if point_axis_name is not None:
        # BN stats must pool over every point shard (and any batch axis
        # already requested via axis_name)
        axis_name = (
            point_axis_name
            if axis_name is None
            else (axis_name, point_axis_name)
        )
    params = variables["params"]
    bn = variables["batch_stats"]
    new_bn = {}
    if mask_norm_and_pool:
        # opt-in corrected mode: padded points excluded everywhere
        stat_mask, pool_mask = mask, mask
    elif mask is not None:
        # Reference mode: BN stats include padded POINTS of real events
        # (pcs.py:53 + :106-127) — but all-masked dummy ROWS (our
        # batch-dim padding for short final batches, which the reference
        # never has) must not pollute the statistics.
        rows = jnp.any(mask, axis=1)
        if point_axis_name is not None:
            # row validity is a GLOBAL property: a row whose local point
            # shard is all padding may still be real on other shards
            rows = (
                jax.lax.psum(rows.astype(jnp.float32), point_axis_name) > 0
            )
        stat_mask = jnp.broadcast_to(rows[:, None], mask.shape)
        pool_mask = None       # pool over all M positions (pcs.py:114)
    else:
        stat_mask, pool_mask = None, None

    def block(name, x, relu=True):
        bn_name = BN_FOR[name]
        y, nb = pointwise_block(
            params[name],
            params[bn_name],
            bn[bn_name],
            x,
            train=train,
            relu=relu,
            mask=stat_mask,
            axis_name=axis_name,
            compute_dtype=compute_dtype,
            fast_stats=fast_bn_stats,
        )
        if train:
            new_bn[bn_name] = nb
        return y

    x = points.astype(compute_dtype)
    x = block("conv1", x)
    point_feat = block("conv2", x)          # 64-ch skip (pcs.py:107)
    x = block("conv3", point_feat)
    x = block("conv4", x)
    x = block("conv5", x)

    g = block("global_feat", x)             # pcs.py:113
    g = global_max_pool(
        g, mask=pool_mask, point_axis_name=point_axis_name
    )                                        # (B, 1024) — pcs.py:114
    g = jnp.broadcast_to(
        g[:, None, :], (x.shape[0], x.shape[1], g.shape[-1])
    )                                        # pcs.py:117
    x = jnp.concatenate([point_feat, g], axis=-1)  # (B, M, 1088) — pcs.py:120

    if train and dropout_rate > 0.0 and dropout_key is None:
        raise ValueError("train=True with dropout needs dropout_key")

    def dropout(x, i):
        if not train or dropout_rate <= 0.0:
            return x
        from pcseg_tpu.ops.pallas.dropout import dropout as _dropout

        return _dropout(x, jax.random.fold_in(dropout_key, i), dropout_rate)

    x = block("seg_conv1", x)
    x = dropout(x, 0)                        # pcs.py:124
    x = block("seg_conv2", x)
    x = dropout(x, 1)                        # pcs.py:126
    x = block("seg_conv3", x)
    logits = pointwise_dense(
        params["seg_conv4"], x, compute_dtype
    ).astype(jnp.float32)                    # raw logits, no BN/act (pcs.py:128)

    if train:
        return logits, new_bn
    return logits


def pointnet_apply_folded(
    folded: dict,
    points: jax.Array,
    compute_dtype=jnp.bfloat16,
    pool_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Serving forward on BN-folded params (ops/fold.py): a pure
    matmul+ReLU chain — one fused kernel per layer, no normalize passes.
    Numerically identical to ``pointnet_apply(train=False)`` up to float
    reassociation.

    ``pool_mask`` (B, M) bool restricts the global max pool to valid rows
    so bucket padding cannot win it (padding-invariant serving; equal to
    the reference's unpadded ``inference_example`` on the same weights).
    Padded rows are zero-filled pre-pool — exact for post-ReLU (>=0)
    features as long as each event has at least one valid point."""

    def layer(name, x, relu=True):
        y = pointwise_dense(folded[name], x, compute_dtype)
        return jnp.maximum(y, 0.0).astype(compute_dtype) if relu else y

    x = points.astype(compute_dtype)
    x = layer("conv1", x)
    point_feat = layer("conv2", x)
    x = layer("conv3", point_feat)
    x = layer("conv4", x)
    x = layer("conv5", x)
    g = layer("global_feat", x)
    if pool_mask is not None:
        g = jnp.where(pool_mask[..., None], g, 0)
    g = jnp.max(g, axis=1)
    g = jnp.broadcast_to(g[:, None, :], x.shape[:2] + (g.shape[-1],))
    x = jnp.concatenate([point_feat, g.astype(compute_dtype)], axis=-1)
    x = layer("seg_conv1", x)
    x = layer("seg_conv2", x)
    x = layer("seg_conv3", x)
    return layer("seg_conv4", x, relu=False).astype(jnp.float32)
