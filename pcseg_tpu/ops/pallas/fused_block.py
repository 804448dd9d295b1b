"""Fused [normalize -> ReLU -> dropout -> matmul -> stats] Pallas block.

The north-star "fused matmul+norm+activation Pallas blocks"
(BASELINE.json configs[3]): one kernel per PointNet layer instead of
XLA's matmul + stat-reduction + normalize + dropout passes.

Op contract (training mode, layer i of the shared-MLP chain):

    x_hat = (x_raw - mu) * inv            # BN normalize w/ GIVEN stats
    z     = x_hat * gamma + beta
    a     = dropout(relu(z))              # optional, hardware PRNG
    y     = a @ W + b                     # MXU
    s1, s2 = column sums of y and y^2     # stats epilogue for layer i+1

``mu``/``inv`` come from the PREVIOUS op's (s1, s2) via cheap XLA glue
(jax autodiff then routes the batch-statistics gradient through the glue,
so the within-op VJP only handles fixed-stats normalization — see
``_bwd``). The backward pass is a single Pallas kernel per layer
producing dx, dW, db, dgamma, dbeta in one sweep (two MXU contractions +
all channel reductions per tile); dmu/dinv follow algebraically from
dgamma/dbeta in the glue:

    dmu  = -gamma * inv * dbeta_like      (dbeta_like = colsum dz)
    dinv =  gamma * dgamma_like / inv     (dgamma_like = colsum dz*x_hat)

Dropout masks are regenerated in the backward kernel from the same
(seed, program_id) pairs as the forward — nothing is stored.

An optional per-row bias ``row_bias`` (B, Cout) supports the PointNet
head's concat trick: seg1([point_feat | g]) == seg1_top(point_feat) +
g @ W_bottom, so the (N, 1088) concat is never materialized; the tiny
g @ W_bottom product becomes this op's row bias (rows of one tile share a
batch row because M % tile == 0).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512

# NUM_HALVES (trace-time sweep knob): how many independent sub-tiles each
# row tile splits into for VPU/MXU overlap (None = 2 when even, else 1).
# fwd and bwd kernels read the same value so regenerated dropout masks
# stay consistent. Swept r3: 2 vs 4 is neutral on every layer.
NUM_HALVES: Optional[int] = None


def _num_halves(tile_rows: int) -> int:
    nh = NUM_HALVES if NUM_HALVES is not None else 2
    while nh > 1 and tile_rows % nh != 0:
        nh //= 2
    return max(1, nh)


def _drop_keep(shape, drop_threshold):
    """Bernoulli keep-mask from the hardware PRNG, one uint32 draw per
    element. Rejected r3 experiment: halving the draw width (bitcast to
    uint16/uint8 thresholds) fails to compile — Mosaic on this target
    supports no sub-32-bit unsigned compares — and seg3 vs seg2 timings
    bound the whole PRNG cost at ~0.1 ms/step anyway."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(drop_threshold)


def _prologue(x, mu, inv, gamma, beta, relu, drop_threshold, drop_scale):
    """normalize -> affine -> relu -> dropout, in f32, returns bf16."""
    xf = x.astype(jnp.float32)
    if mu is not None:
        xf = (xf - mu) * inv
    z = xf * gamma + beta if gamma is not None else xf
    if relu:
        z = jnp.maximum(z, 0.0)
    if drop_threshold is not None:
        keep = _drop_keep(z.shape, drop_threshold)
        z = jnp.where(keep, z * drop_scale, 0.0)
    return z


def _fwd_kernel(
    # refs: [seed?] x, mu?, inv?, gamma?, beta?, w, b, row_bias? -> y, s1?, s2?
    *refs,
    normalize: bool,
    relu: bool,
    drop_threshold: Optional[int],
    drop_scale: float,
    has_row_bias: bool,
    emit_stats: bool,
    out_dtype,
    tiles_per_batch: int = 1,
):
    it = iter(refs)
    seed_ref = next(it) if drop_threshold is not None else None
    x_ref = next(it)
    if normalize:
        mu_ref, inv_ref, gamma_ref, beta_ref = (
            next(it), next(it), next(it), next(it),
        )
    w_ref = next(it)
    b_ref = next(it)
    rb_ref = next(it) if has_row_bias else None
    y_ref = next(it)
    if emit_stats:
        s1_ref, s2_ref = next(it), next(it)

    if drop_threshold is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    if emit_stats:
        @pl.when(pl.program_id(0) == 0)
        def _():
            s1_ref[:] = jnp.zeros_like(s1_ref)
            s2_ref[:] = jnp.zeros_like(s2_ref)

    # The per-tile VPU work (normalize/ReLU prologue, stats epilogue)
    # serializes behind the tile's MXU matmul when written as one
    # dependency chain — the r3 per-layer profile showed every
    # non-dropout forward 1.5-7x off its matmul roofline by exactly the
    # serialized VPU cost. Splitting the tile into independent halves
    # breaks the chain so Mosaic can overlap half h's matmul (MXU) with
    # half h+1's prologue / half h-1's epilogue (VPU). Dropout layers
    # split too: fwd and bwd share one tile size when dropout is active
    # and both kernels split identically, so the PRNG stream (whose
    # state serializes the two draws in program order) is consumed in
    # the same half0-then-half1 order on both sides — masks match.
    # (An MXU-ones-colsum epilogue measured neutral — the fix is
    # overlap, not fewer VPU ops.)
    tile_rows = x_ref.shape[0]
    nh = _num_halves(tile_rows)
    t = tile_rows // nh
    for h in range(nh):
        a = _prologue(
            x_ref[h * t:(h + 1) * t],
            mu_ref[0] if normalize else None,
            inv_ref[0] if normalize else None,
            gamma_ref[0] if normalize else None,
            beta_ref[0] if normalize else None,
            relu,
            drop_threshold,
            drop_scale,
        ).astype(w_ref.dtype)  # matmul operand precision = weight dtype

        y = jax.lax.dot_general(
            a,
            w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]
        if has_row_bias:
            # full (B, Cout) block; rows of one tile share a batch row
            y = y + rb_ref[pl.program_id(0) // tiles_per_batch]

        y_ref[h * t:(h + 1) * t] = y.astype(out_dtype)

        if emit_stats:
            s1_ref[:] += jnp.sum(y, axis=0, keepdims=True)
            s2_ref[:] += jnp.sum(jnp.square(y), axis=0, keepdims=True)


def _fwd_pallas(
    x, mu, inv, gamma, beta, w, b, row_bias, seed,
    *, relu, drop_rate, emit_stats, rows_per_batch, tile, out_dtype,
):
    n, cin = x.shape
    cout = w.shape[1]
    normalize = mu is not None
    drop_threshold = (
        min(int(drop_rate * (1 << 32)), (1 << 32) - 1)
        if drop_rate > 0.0
        else None
    )
    # The forward kernel holds ~half the backward's per-row VMEM (no dy/dx
    # tiles, no dW accumulator), so it can take twice the row tile — but
    # NOT when dropout is active: masks are regenerated in the backward
    # from (seed + program_id) per tile, so fwd and bwd must use the SAME
    # tile size or the PRNG streams (and therefore the masks) diverge.
    if (
        drop_threshold is None
        and n % (tile * 2) == 0
        and (rows_per_batch == 0 or rows_per_batch % (tile * 2) == 0)
    ):
        tile = tile * 2
    drop_scale = 1.0 / (1.0 - drop_rate) if drop_rate > 0.0 else 1.0
    grid = pl.cdiv(n, tile)
    vma = getattr(jax.typeof(x), "vma", frozenset())

    def vspec(shape, index_map=None):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    in_specs = []
    inputs = []
    if drop_threshold is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)
    in_specs.append(vspec((tile, cin), lambda i: (i, 0)))
    inputs.append(x)
    if normalize:
        for v in (mu, inv, gamma, beta):
            in_specs.append(vspec((1, cin), lambda i: (0, 0)))
            inputs.append(v.reshape(1, cin))
    in_specs.append(vspec((cin, cout), lambda i: (0, 0)))
    inputs.append(w)
    in_specs.append(vspec((1, cout), lambda i: (0, 0)))
    inputs.append(b.reshape(1, cout))
    tiles_per_batch = max(1, rows_per_batch // tile)
    if row_bias is not None:
        in_specs.append(vspec(row_bias.shape, lambda i: (0, 0)))
        inputs.append(row_bias)

    out_shapes = [jax.ShapeDtypeStruct((n, cout), out_dtype, vma=vma)]
    out_specs = [vspec((tile, cout), lambda i: (i, 0))]
    if emit_stats:
        out_shapes += [
            jax.ShapeDtypeStruct((1, cout), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cout), jnp.float32, vma=vma),
        ]
        out_specs += [
            vspec((1, cout), lambda i: (0, 0)),
            vspec((1, cout), lambda i: (0, 0)),
        ]

    kernel = functools.partial(
        _fwd_kernel,
        normalize=normalize,
        relu=relu,
        drop_threshold=drop_threshold,
        drop_scale=drop_scale,
        has_row_bias=row_bias is not None,
        emit_stats=emit_stats,
        out_dtype=out_dtype,
        tiles_per_batch=tiles_per_batch,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    if emit_stats:
        y, s1, s2 = out
        return y, s1.reshape(cout), s2.reshape(cout)
    return (out if not isinstance(out, (list, tuple)) else out[0]), None, None


def _bwd_kernel(
    *refs,
    normalize: bool,
    relu: bool,
    drop_threshold: Optional[int],
    drop_scale: float,
    has_row_bias: bool,
    emit_stats: bool,
    tiles_per_batch: int = 1,
):
    # inputs: [seed?] x, mu?, inv?, gamma?, beta?, w, y, dy, ds1?, ds2?
    # outputs: dx, dw, db, [dgamma_like, dbeta_like]?, [drow_bias]?
    it = iter(refs)
    seed_ref = next(it) if drop_threshold is not None else None
    x_ref = next(it)
    if normalize:
        mu_ref, inv_ref, gamma_ref, beta_ref = (
            next(it), next(it), next(it), next(it),
        )
    w_ref = next(it)
    y_ref = next(it) if emit_stats else None
    dy_ref = next(it)
    if emit_stats:
        ds1_ref, ds2_ref = next(it), next(it)
    dx_ref = next(it)
    dw_ref = next(it)
    db_ref = next(it)
    if normalize:
        dg_ref, dbta_ref = next(it), next(it)
    drb_ref = next(it) if has_row_bias else None

    if drop_threshold is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        if normalize:
            dg_ref[:] = jnp.zeros_like(dg_ref)
            dbta_ref[:] = jnp.zeros_like(dbta_ref)
        if has_row_bias:
            drb_ref[:] = jnp.zeros_like(drb_ref)

    # Same half-splitting as the forward kernel: break the per-tile
    # VPU -> MXU -> VPU dependency chain so Mosaic can overlap one
    # half's matmuls with the other half's elementwise work (measured
    # fwd: conv5 0.78 -> 0.43 ms, seg1 0.42 -> 0.23). Dropout layers
    # split the same way as the forward (same tile, same halves), so
    # mask regeneration consumes the PRNG stream in the forward's
    # half0-then-half1 draw order.
    tile_rows = x_ref.shape[0]
    nh = _num_halves(tile_rows)
    t = tile_rows // nh
    for h in range(nh):
        sl = slice(h * t, (h + 1) * t)
        # effective cotangent on y: dy + ds1 + 2*y*ds2 (stats VJP)
        dy = dy_ref[sl].astype(jnp.float32)
        if emit_stats:
            dy = dy + ds1_ref[0] + (
                2.0 * y_ref[sl].astype(jnp.float32) * ds2_ref[0]
            )
        dy_b = dy.astype(w_ref.dtype)

        # recompute the prologue activation a (same PRNG stream as fwd)
        xf = x_ref[sl].astype(jnp.float32)
        if normalize:
            x_hat = (xf - mu_ref[0]) * inv_ref[0]
            z = x_hat * gamma_ref[0] + beta_ref[0]
        else:
            x_hat = xf
            z = xf
        if relu:
            zr = jnp.maximum(z, 0.0)
            relu_mask = (z > 0.0).astype(jnp.float32)
        else:
            zr = z
            relu_mask = None
        if drop_threshold is not None:
            keep = _drop_keep(z.shape, drop_threshold)
            a = jnp.where(keep, zr * drop_scale, 0.0)
            drop_mask = jnp.where(keep, drop_scale, 0.0)
        else:
            a = zr
            drop_mask = None

        # dW += a^T @ dy ; db += colsum dy
        dw_ref[:] += jax.lax.dot_general(
            a.astype(w_ref.dtype),
            dy_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
        if has_row_bias:
            bi = pl.program_id(0) // tiles_per_batch
            drb_ref[bi, :] += jnp.sum(dy, axis=0)

        # da = dy @ W^T ; back through dropout/relu
        da = jax.lax.dot_general(
            dy_b,
            w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if drop_mask is not None:
            da = da * drop_mask
        dz = da * relu_mask if relu_mask is not None else da

        if normalize:
            dg_ref[:] += jnp.sum(dz * x_hat, axis=0, keepdims=True)
            dbta_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
            dx = dz * gamma_ref[0] * inv_ref[0]
        else:
            dx = dz
        dx_ref[sl] = dx.astype(dx_ref.dtype)


def _bwd_pallas(
    x, mu, inv, gamma, beta, w, y, dy, ds1, ds2, seed,
    *, relu, drop_rate, emit_stats, has_row_bias, rows_per_batch, tile,
):
    n, cin = x.shape
    cout = w.shape[1]
    normalize = mu is not None
    drop_threshold = (
        min(int(drop_rate * (1 << 32)), (1 << 32) - 1)
        if drop_rate > 0.0
        else None
    )
    drop_scale = 1.0 / (1.0 - drop_rate) if drop_rate > 0.0 else 1.0
    grid = pl.cdiv(n, tile)
    vma = getattr(jax.typeof(x), "vma", frozenset())

    def vspec(shape, index_map=None):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    in_specs, inputs = [], []
    if drop_threshold is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)
    in_specs.append(vspec((tile, cin), lambda i: (i, 0)))
    inputs.append(x)
    if normalize:
        for v in (mu, inv, gamma, beta):
            in_specs.append(vspec((1, cin), lambda i: (0, 0)))
            inputs.append(v.reshape(1, cin))
    in_specs.append(vspec((cin, cout), lambda i: (0, 0)))
    inputs.append(w)
    if emit_stats:
        in_specs.append(vspec((tile, cout), lambda i: (i, 0)))
        inputs.append(y)
    in_specs.append(vspec((tile, cout), lambda i: (i, 0)))
    inputs.append(dy)
    if emit_stats:
        for v in (ds1, ds2):
            in_specs.append(vspec((1, cout), lambda i: (0, 0)))
            inputs.append(v.reshape(1, cout))

    out_shapes = [
        jax.ShapeDtypeStruct((n, cin), x.dtype, vma=vma),        # dx
        jax.ShapeDtypeStruct((cin, cout), jnp.float32, vma=vma),  # dw
        jax.ShapeDtypeStruct((1, cout), jnp.float32, vma=vma),    # db
    ]
    out_specs = [
        vspec((tile, cin), lambda i: (i, 0)),
        vspec((cin, cout), lambda i: (0, 0)),
        vspec((1, cout), lambda i: (0, 0)),
    ]
    if normalize:
        out_shapes += [
            jax.ShapeDtypeStruct((1, cin), jnp.float32, vma=vma),  # dgamma~
            jax.ShapeDtypeStruct((1, cin), jnp.float32, vma=vma),  # dbeta~
        ]
        out_specs += [
            vspec((1, cin), lambda i: (0, 0)),
            vspec((1, cin), lambda i: (0, 0)),
        ]
    tiles_per_batch = max(1, rows_per_batch // tile)
    if has_row_bias:
        n_batch = max(1, n // rows_per_batch)
        out_shapes.append(
            jax.ShapeDtypeStruct((n_batch, cout), jnp.float32, vma=vma)
        )
        out_specs.append(vspec((n_batch, cout), lambda i: (0, 0)))

    kernel = functools.partial(
        _bwd_kernel,
        normalize=normalize,
        relu=relu,
        drop_threshold=drop_threshold,
        drop_scale=drop_scale,
        has_row_bias=has_row_bias,
        emit_stats=emit_stats,
        tiles_per_batch=tiles_per_batch,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14)
)
def fused_block(
    x, mu, inv, gamma, beta, w, b, row_bias, seed,
    relu: bool = True,
    drop_rate: float = 0.0,
    emit_stats: bool = True,
    rows_per_batch: int = 0,
    tile: int = DEFAULT_TILE,
    out_dtype=jnp.bfloat16,
):
    """One fused chain layer. See module docstring.

    x: (N, Cin); mu/inv/gamma/beta: (Cin,) or all None (no normalize
    prologue); w: (Cin, Cout) bf16-castable; b: (Cout,);
    row_bias: (N // rows_per_batch, Cout) or None; seed: (1,) int32.
    Returns (y (N, Cout) out_dtype, s1 (Cout) f32, s2 (Cout) f32);
    s1/s2 are None when emit_stats=False.
    """
    y, s1, s2 = _fwd_pallas(
        x, mu, inv, gamma, beta, w, b, row_bias, seed,
        relu=relu, drop_rate=drop_rate, emit_stats=emit_stats,
        rows_per_batch=rows_per_batch, tile=tile, out_dtype=out_dtype,
    )
    return y, s1, s2


def _fused_fwd(
    x, mu, inv, gamma, beta, w, b, row_bias, seed,
    relu, drop_rate, emit_stats, rows_per_batch, tile, out_dtype,
):
    y, s1, s2 = _fwd_pallas(
        x, mu, inv, gamma, beta, w, b, row_bias, seed,
        relu=relu, drop_rate=drop_rate, emit_stats=emit_stats,
        rows_per_batch=rows_per_batch, tile=tile, out_dtype=out_dtype,
    )
    res = (x, mu, inv, gamma, beta, w, y if emit_stats else None, seed,
           row_bias is not None)
    return (y, s1, s2), res


def _fused_bwd(
    relu, drop_rate, emit_stats, rows_per_batch, tile, out_dtype, res, ct
):
    x, mu, inv, gamma, beta, w, y, seed, has_row_bias = res
    dy, ds1, ds2 = ct
    if ds1 is None or isinstance(ds1, jax.custom_derivatives.SymbolicZero):
        emit = False
        ds1 = ds2 = None
    else:
        emit = emit_stats
    outs = _bwd_pallas(
        x, mu, inv, gamma, beta, w, y, dy, ds1, ds2, seed,
        relu=relu, drop_rate=drop_rate, emit_stats=emit,
        has_row_bias=has_row_bias, rows_per_batch=rows_per_batch, tile=tile,
    )
    it = iter(outs)
    dx = next(it)
    dw = next(it)
    db = next(it).reshape(-1)
    normalize = mu is not None
    if normalize:
        dg_like = next(it).reshape(-1)   # colsum dz * x_hat
        dbta_like = next(it).reshape(-1)  # colsum dz
        dgamma = dg_like
        dbeta = dbta_like
        # stats inputs mu/inv get their own cotangents (they are plain
        # inputs here; the glue upstream differentiates mu(s1), inv(s1,s2))
        dmu = -gamma * inv * dbta_like
        dinv = gamma * dg_like / inv
    else:
        dgamma = dbeta = dmu = dinv = None
    drb = next(it) if has_row_bias else None
    return (dx, dmu, dinv, dgamma, dbeta, dw, db, drb, None)


fused_block.defvjp(_fused_fwd, _fused_bwd)
