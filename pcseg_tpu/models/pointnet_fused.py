"""PointNetSeg training forward on fused Pallas blocks.

Drives ops/pallas/fused_block.fused_block across the whole shared-MLP
chain: each layer is ONE kernel ([normalize prev -> ReLU -> dropout ->
matmul -> stats epilogue]) instead of XLA's separate matmul / reduction /
normalize / dropout passes, and the head's (N, 1088) concat is never
materialized (seg1 = point_feat-branch matmul + per-batch-row bias from
the tiny g @ W_bottom product).

Semantics = the reference model in "fast BN" mode:
- batch statistics include padded positions (reference behavior,
  pcs.py:53/:106-127) AND any all-masked dummy rows (deviation: only
  affects short final batches; the XLA path excludes dummy rows);
- variance via single-pass E[x^2]-mu^2 in f32;
- inter-layer activations are bf16 (raw pre-norm values), stats f32.

Selected with ``PointNetSeg(bn_stats="fused")`` for train-mode apply on
TPU; eval/CPU fall back to the XLA path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.batchnorm import EPS, MOMENTUM
from pcseg_tpu.ops.pallas.fused_block import fused_block
from pcseg_tpu.ops.pallas.fused_global import fused_global_pool_block

# chain order: (conv name, bn-of-INPUT name or None); global_feat is
# handled separately (fused with the max pool, ops/pallas/fused_global)
_ENCODER_CHAIN = [
    ("conv1", None),           # raw points in
    ("conv2", "bn1"),
    ("conv3", "bn2"),
    ("conv4", "bn3"),
    ("conv5", "bn4"),
]


def _pick_tile(
    n: int,
    rows_per_batch: Optional[int] = None,
    cin: int = 0,
    cout: int = 0,
) -> int:
    """Largest row tile that (a) divides n (and rows_per_batch when the
    row-bias trick is in play) and (b) keeps the backward kernel's
    double-buffered tiles (x, dx, y, dy ~= 12 bytes/channel/row) plus the
    resident W/dW under the VMEM budget."""
    budget = 7 * 1024 * 1024  # swept: 7MB -> 19.4 ms, 5MB -> 20.0, 3MB -> 21.4
    # Measured winners that beat the budget formula (bench_fused_variants,
    # r3 device sweep): the seg2-shaped dropout block runs ~6% faster at a
    # row tile of 1024 (f+b 1.510 vs 1.600 ms at B64xM2048) even though
    # its backward slightly exceeds the 7MB heuristic; VMEM holds.
    swept = {(512, 256): 1024}
    t = swept.get((cin, cout))
    if t and n % t == 0 and (rows_per_batch is None or
                             rows_per_batch % t == 0):
        return t
    per_row = max(1, (cin + cout) * 12)
    cap = max(64, budget // per_row)
    # big tiles matter for NARROW layers: their per-grid-step overhead
    # dominates (tile 4096 at 128ch stays ~6MB)
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t > cap:
            continue
        if n % t == 0 and (rows_per_batch is None or rows_per_batch % t == 0):
            return t
    # No silent fallback: the CE epilogue kernel (and the row-bias pool
    # trick when rows_per_batch is set) REQUIRE the tile to divide the row
    # count — an out-of-bounds final tile would read garbage rows whose
    # labels can pass the `lab >= 0` valid test and silently corrupt the
    # loss. Callers (pointnet.py apply / train steps) route indivisible
    # shapes to the XLA path instead.
    raise ValueError(
        f"fused PointNet path needs the point count per batch row to be "
        f"a multiple of 8 (got n={n}, rows_per_batch={rows_per_batch}); "
        f"use bucket sizes that are multiples of 8, or bn_stats='fast'"
    )


def _stats_to_norm(s1, s2, n):
    """Column sums -> (mu, inv, biased var); differentiable glue."""
    mu = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    return mu, inv, var


# Minimum cin*cout to use the Pallas block instead of plain XLA ops.
# Measured: routing the small (<=64x128) layers to XLA made the full step
# SLOWER (21.2 vs 20.0 ms) — the extra XLA stat/normalize passes cost more
# than the Pallas per-tile overhead — so everything stays fused. The XLA
# block remains as documentation of the measured tradeoff and as a
# non-Pallas fallback.
_FUSE_MIN_FLOPS_PER_ROW = 0


def _xla_block(h, mu, inv, gamma, beta, w, b, row_bias, relu, act_dtype,
               rows_per_batch=0):
    """Same op contract as fused_block, in plain XLA (autodiff'd)."""
    xf = h.astype(jnp.float32)
    if mu is not None:
        xf = (xf - mu) * inv * gamma + beta
    if relu:
        xf = jnp.maximum(xf, 0.0)
    a = xf.astype(w.dtype)
    y = jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b
    if row_bias is not None:
        y = y + jnp.repeat(row_bias, rows_per_batch, axis=0)
    s1 = jnp.sum(y, axis=0)
    s2 = jnp.sum(jnp.square(y), axis=0)
    return y.astype(act_dtype), s1, s2


def _fused_chain(
    variables: dict,
    points: jax.Array,
    *,
    dropout_key: Optional[jax.Array],
    dropout_rate: float,
    act_dtype=jnp.bfloat16,
    weight_dtype=jnp.bfloat16,
):
    """Shared fused chain through seg_conv3: returns
    (y_s3 raw pre-norm, (s1_3, s2_3), n, new_bn, shape) — everything the
    final classifier stage (plain logits OR the fused seg4+CE op) needs.
    """
    params = variables["params"]
    bn = variables["batch_stats"]
    b_, m_, d_ = points.shape
    n = b_ * m_
    nf = jnp.float32(n)

    if dropout_rate > 0.0:
        seeds = jax.random.bits(dropout_key, (2,), jnp.uint32).astype(jnp.int32)
        seed0, seed1 = seeds[0:1], seeds[1:2]
    else:
        seed0 = seed1 = jnp.zeros((1,), jnp.int32)

    x = points.reshape(n, d_).astype(act_dtype)

    new_bn = {}

    def update_running(bn_name, s1, s2):
        mu = s1 / nf
        var_b = jnp.maximum(s2 / nf - jnp.square(mu), 0.0)
        unbiased = var_b * (nf / jnp.maximum(nf - 1.0, 1.0))
        st = bn[bn_name]
        new_bn[bn_name] = {
            "mean": (1.0 - MOMENTUM) * st["mean"] + MOMENTUM * mu,
            "var": (1.0 - MOMENTUM) * st["var"] + MOMENTUM * unbiased,
        }

    # --- encoder chain
    stats = None
    saved = {}
    h = x
    for conv, bn_in in _ENCODER_CHAIN:
        if bn_in is None:
            mu = inv = gamma = beta = None
        else:
            mu, inv, _ = _stats_to_norm(*stats, nf)
            gamma, beta = params[bn_in]["scale"], params[bn_in]["bias"]
        cin, cout = params[conv]["kernel"].shape
        w = params[conv]["kernel"].astype(weight_dtype)
        if cin * cout >= _FUSE_MIN_FLOPS_PER_ROW:
            y, s1, s2 = fused_block(
                h, mu, inv, gamma, beta, w, params[conv]["bias"],
                None, seed0,
                bn_in is not None,  # prologue relu; conv1 sees raw points
                0.0, True, 0, _pick_tile(n, None, cin, cout), act_dtype,
            )
        else:
            y, s1, s2 = _xla_block(
                h, mu, inv, gamma, beta, w, params[conv]["bias"], None,
                bn_in is not None, act_dtype,
            )
        update_running(
            {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
             "conv4": "bn4", "conv5": "bn5"}[conv],
            s1, s2,
        )
        saved[conv] = (h, stats)
        h, stats = y, (s1, s2)

    # --- global layer + global max pool, ONE kernel (pcs.py:113-114).
    # The r2 two-op form (fused_block + fused_global_pool) still moved
    # the (N, 1024) global activation through HBM three extra times; the
    # fused op pools sign(gamma)*y in the layer kernel itself (BN+ReLU
    # is per-channel monotone) and only the (B, 1024) winners are
    # normalized here, in differentiable glue (ops/pallas/fused_global).
    mu5, inv5, _ = _stats_to_norm(*stats, nf)
    gam_g = params["bn_global"]["scale"]
    bet_g = params["bn_global"]["bias"]
    sign_g = jax.lax.stop_gradient(jnp.sign(gam_g))
    s1_g, s2_g, best, _idx = fused_global_pool_block(
        h, mu5, inv5, params["bn5"]["scale"], params["bn5"]["bias"],
        params["global_feat"]["kernel"].astype(weight_dtype),
        params["global_feat"]["bias"], sign_g,
        m_, _pick_tile(n, m_, 1024, 1024), act_dtype,
    )
    update_running("bn_global", s1_g, s2_g)
    mu_g, inv_g, _ = _stats_to_norm(s1_g, s2_g, nf)
    y_best = sign_g * best                               # raw y at winner
    z_best = jnp.where(
        gam_g == 0.0, bet_g, (y_best - mu_g) * inv_g * gam_g + bet_g
    )
    g = jnp.maximum(z_best, 0.0)                         # (B, 1024)

    # --- head; seg1 via the split-matmul trick
    w_seg1 = params["seg_conv1"]["kernel"]               # (1088, 512)
    w_top, w_bot = w_seg1[:64], w_seg1[64:]
    gbias = g.astype(weight_dtype) @ w_bot.astype(weight_dtype)  # (B, 512)
    gbias = gbias.astype(jnp.float32)

    # conv3's saved input pair IS conv2's raw output + its stats — exactly
    # what seg1's prologue needs to regenerate point_feat (pcs.py:107/120)
    y2, stats2 = saved["conv3"]
    mu2, inv2, _ = _stats_to_norm(*stats2, nf)

    y_s1, s1_1, s2_1 = fused_block(
        y2, mu2, inv2, params["bn2"]["scale"], params["bn2"]["bias"],
        w_top.astype(weight_dtype), params["seg_conv1"]["bias"],
        gbias, seed0,
        True, 0.0, True, m_, _pick_tile(n, m_, 64, 512), act_dtype,
    )
    update_running("bn_seg1", s1_1, s2_1)

    mu_s1, inv_s1, _ = _stats_to_norm(s1_1, s2_1, nf)
    y_s2, s1_2, s2_2 = fused_block(
        y_s1, mu_s1, inv_s1,
        params["bn_seg1"]["scale"], params["bn_seg1"]["bias"],
        params["seg_conv2"]["kernel"].astype(weight_dtype),
        params["seg_conv2"]["bias"],
        None, seed0,
        True, dropout_rate, True, 0, _pick_tile(n, None, 512, 256), act_dtype,
    )
    update_running("bn_seg2", s1_2, s2_2)

    mu_s2, inv_s2, _ = _stats_to_norm(s1_2, s2_2, nf)
    y_s3, s1_3, s2_3 = fused_block(
        y_s2, mu_s2, inv_s2,
        params["bn_seg2"]["scale"], params["bn_seg2"]["bias"],
        params["seg_conv3"]["kernel"].astype(weight_dtype),
        params["seg_conv3"]["bias"],
        None, seed1,
        True, dropout_rate, True, 0, _pick_tile(n, None, 256, 128), act_dtype,
    )
    update_running("bn_seg3", s1_3, s2_3)
    return y_s3, (s1_3, s2_3), n, new_bn, (b_, m_)


def pointnet_apply_fused(
    variables: dict,
    points: jax.Array,
    *,
    dropout_key: Optional[jax.Array],
    dropout_rate: float,
    act_dtype=jnp.bfloat16,
    weight_dtype=jnp.bfloat16,
):
    """Training forward; returns (logits f32, new_batch_stats).

    Gradients flow through every fused block via its custom VJP; the
    mu/inv glue between blocks is plain XLA, so the batch-statistics
    gradient path is handled by autodiff.
    """
    params = variables["params"]
    y_s3, (s1_3, s2_3), n, new_bn, (b_, m_) = _fused_chain(
        variables, points,
        dropout_key=dropout_key, dropout_rate=dropout_rate,
        act_dtype=act_dtype, weight_dtype=weight_dtype,
    )
    seed0 = jnp.zeros((1,), jnp.int32)
    mu_s3, inv_s3, _ = _stats_to_norm(s1_3, s2_3, jnp.float32(n))
    logits, _, _ = fused_block(
        y_s3, mu_s3, inv_s3,
        params["bn_seg3"]["scale"], params["bn_seg3"]["bias"],
        params["seg_conv4"]["kernel"].astype(weight_dtype),
        params["seg_conv4"]["bias"],
        None, seed0,
        True, 0.0, False, 0,
        _pick_tile(n, None, 128, params["seg_conv4"]["kernel"].shape[1]),
        jnp.float32,
    )
    return logits.reshape(b_, m_, -1), new_bn


def pointnet_fused_train_loss(
    variables: dict,
    points: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array,
    *,
    dropout_key: Optional[jax.Array],
    dropout_rate: float,
    act_dtype=jnp.bfloat16,
    weight_dtype=jnp.bfloat16,
):
    """Fused-chain training LOSS: the classifier layer and the weighted
    CE run as one kernel (ops/pallas/fused_ce.py), so the (N, C) logits
    never touch HBM and none of the C/128-lane-efficiency XLA loss ops
    run (VERDICT r2 #1).

    Returns ((num, den, correct), new_batch_stats): per-shard weighted-CE
    partial sums (cross_entropy_sums contract — psum num/den across DP
    shards and divide for the global loss, train/steps.py) and the
    argmax-correct count over label-valid rows.
    """
    from pcseg_tpu.ops.pallas.fused_ce import fused_seg4_ce

    params = variables["params"]
    y_s3, (s1_3, s2_3), n, new_bn, (b_, m_) = _fused_chain(
        variables, points,
        dropout_key=dropout_key, dropout_rate=dropout_rate,
        act_dtype=act_dtype, weight_dtype=weight_dtype,
    )
    mu_s3, inv_s3, _ = _stats_to_norm(s1_3, s2_3, jnp.float32(n))
    w4 = params["seg_conv4"]["kernel"]
    num, den, correct = fused_seg4_ce(
        y_s3, mu_s3, inv_s3,
        params["bn_seg3"]["scale"], params["bn_seg3"]["bias"],
        w4, params["seg_conv4"]["bias"],
        labels.reshape(n), class_weights,
        w4.shape[1], _pick_tile(n, None, 128, 128),
    )
    return (num, den, correct), new_bn
