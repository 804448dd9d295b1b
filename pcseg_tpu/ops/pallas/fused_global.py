"""Global layer + global max pool in ONE fused Pallas op.

The reference's global-feature stage (pcs.py:113-114) is
``bn5-normalize -> relu -> matmul W_global -> bn_global -> relu ->
max over points``. Round 2 fused it as two Pallas ops (fused_block +
fused_global_pool), which still moved the (N, 1024) global activation
through HBM three extra times: the pool forward re-read it, the pool
backward wrote a one-hot (N, 1024) cotangent, and the layer backward
read that cotangent back (~0.8 GB/step at B64xM2048).

This op folds the pool INTO the layer kernel using per-channel
monotonicity: with z = (y - mu_g) * inv_g * gamma_g + beta_g and
inv_g > 0, z is monotone in y with slope sign(gamma_g), so

    argmax_rows z = argmax_rows (sign(gamma_g) * y)

even though mu_g/inv_g (batch statistics of y itself) are unknown until
the whole pass finishes. The kernel tracks per-(batch, channel) running
``best = max sign*y`` and its FIRST row index (torch.max tie semantics)
alongside the usual stats epilogue; the tiny (B, C) pooled winners are
normalized+ReLU'd OUTSIDE in differentiable XLA glue, so every
bn_global gradient flows through autodiff — the op's VJP only scatters
the ``best`` cotangent back to the winner rows, which the layer
backward kernel does with a resident (B, C) block while it reads y
anyway for the stats VJP (no extra HBM pass).

gamma_g == 0 channels: z == beta_g everywhere; sign = 0 makes every row
tie at 0, the kernel picks row 0 (torch picks index 0 too), and the
glue emits relu(beta_g) with zero gradient to y — identical semantics.

forward:  (y, s1, s2, best, idx) = kernel(x, bn5 terms, W, b, sign)
glue:     g = relu((sign * best - mu_g) * inv_g * gamma_g + beta_g)
backward: dy_eff = ds1 + 2 y ds2 + onehot(idx) * (dbest)  [in-kernel]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcseg_tpu.ops.pallas.fused_block import _num_halves, _prologue

_BIG = 2**30
_NEG = -3.0e38


def _fwd_kernel(
    x_ref, mu_ref, inv_ref, gamma_ref, beta_ref, w_ref, b_ref, s_ref,
    y_ref, s1_ref, s2_ref, best_ref, idx_ref,
    *, tiles_per_batch: int, tile: int, out_dtype,
):
    i = pl.program_id(0)
    b = i // tiles_per_batch

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    @pl.when(i % tiles_per_batch == 0)
    def _():
        best_ref[b, :] = jnp.full_like(best_ref[b, :], _NEG)
        idx_ref[b, :] = jnp.zeros_like(idx_ref[b, :])

    row_base = (i % tiles_per_batch) * tile
    nh = _num_halves(tile)
    t = tile // nh
    for h in range(nh):
        a = _prologue(
            x_ref[h * t:(h + 1) * t],
            mu_ref[0], inv_ref[0], gamma_ref[0], beta_ref[0],
            True, None, 1.0,
        ).astype(w_ref.dtype)
        y = jax.lax.dot_general(
            a, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]
        y_ref[h * t:(h + 1) * t] = y.astype(out_dtype)
        s1_ref[:] += jnp.sum(y, axis=0, keepdims=True)
        s2_ref[:] += jnp.sum(jnp.square(y), axis=0, keepdims=True)

        # pool tracking on sign-adjusted RAW outputs (see module doc).
        # Compare in the Y dtype actually stored so best == s * y_ref at
        # the winner bit-exactly (the glue recomputes z from best).
        sm = y.astype(out_dtype).astype(jnp.float32) * s_ref[0]
        tile_max = jnp.max(sm, axis=0)                        # (C,)
        rows = jax.lax.broadcasted_iota(jnp.int32, sm.shape, 0)
        tile_arg = jnp.min(jnp.where(sm == tile_max, rows, _BIG), axis=0)
        upd = tile_max > best_ref[b, :]
        idx_ref[b, :] = jnp.where(
            upd, tile_arg + row_base + h * t, idx_ref[b, :]
        )
        best_ref[b, :] = jnp.where(upd, tile_max, best_ref[b, :])


def _bwd_kernel(
    x_ref, mu_ref, inv_ref, gamma_ref, beta_ref, w_ref, y_ref,
    ds1_ref, ds2_ref, pval_ref, idx_ref,
    dx_ref, dw_ref, db_ref, dg_ref, dbta_ref,
    *, tiles_per_batch: int, tile: int,
):
    i = pl.program_id(0)
    b = i // tiles_per_batch
    row_base = (i % tiles_per_batch) * tile

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbta_ref[:] = jnp.zeros_like(dbta_ref)

    nh = _num_halves(tile)
    t = tile // nh
    for h in range(nh):
        sl = slice(h * t, (h + 1) * t)
        y = y_ref[sl].astype(jnp.float32)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
            + row_base + h * t
        )
        dy = (
            ds1_ref[0]
            + 2.0 * y * ds2_ref[0]
            + jnp.where(rows == idx_ref[b, :], pval_ref[b, :], 0.0)
        )
        dy_b = dy.astype(w_ref.dtype)

        xf = x_ref[sl].astype(jnp.float32)
        x_hat = (xf - mu_ref[0]) * inv_ref[0]
        z = x_hat * gamma_ref[0] + beta_ref[0]
        a = jnp.maximum(z, 0.0)
        relu_mask = (z > 0.0).astype(jnp.float32)

        dw_ref[:] += jax.lax.dot_general(
            a.astype(w_ref.dtype), dy_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)

        da = jax.lax.dot_general(
            dy_b, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz = da * relu_mask
        dg_ref[:] += jnp.sum(dz * x_hat, axis=0, keepdims=True)
        dbta_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
        dx_ref[sl] = (dz * gamma_ref[0] * inv_ref[0]).astype(dx_ref.dtype)


def _vspec(shape, index_map=None):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _fwd_pallas(x, mu, inv, gamma, beta, w, b, sign, rows_per_batch, tile,
                out_dtype):
    n, cin = x.shape
    cout = w.shape[1]
    if n % rows_per_batch or rows_per_batch % tile:
        raise ValueError(
            f"need N % rows_per_batch == 0 and rows_per_batch % tile == 0; "
            f"got N={n}, rows_per_batch={rows_per_batch}, tile={tile}"
        )
    nb = n // rows_per_batch
    tpb = rows_per_batch // tile
    vma = getattr(jax.typeof(x), "vma", frozenset())

    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, tiles_per_batch=tpb, tile=tile, out_dtype=out_dtype
        ),
        grid=(n // tile,),
        in_specs=[
            _vspec((tile, cin), lambda i: (i, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((cin, cout), lambda i: (0, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=[
            _vspec((tile, cout), lambda i: (i, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
            _vspec((nb, cout), lambda i: (0, 0)),
            _vspec((nb, cout), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cout), out_dtype, vma=vma),
            jax.ShapeDtypeStruct((1, cout), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cout), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nb, cout), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nb, cout), jnp.int32, vma=vma),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        x,
        mu.reshape(1, cin), inv.reshape(1, cin),
        gamma.reshape(1, cin), beta.reshape(1, cin),
        w, b.reshape(1, cout), sign.reshape(1, cout),
    )
    y, s1, s2, best, idx = outs
    return y, s1.reshape(cout), s2.reshape(cout), best, idx


def _bwd_pallas(x, mu, inv, gamma, beta, w, y, ds1, ds2, pval, idx,
                rows_per_batch, tile):
    n, cin = x.shape
    cout = w.shape[1]
    nb = n // rows_per_batch
    tpb = rows_per_batch // tile
    vma = getattr(jax.typeof(x), "vma", frozenset())

    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_per_batch=tpb, tile=tile),
        grid=(n // tile,),
        in_specs=[
            _vspec((tile, cin), lambda i: (i, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((cin, cout), lambda i: (0, 0)),
            _vspec((tile, cout), lambda i: (i, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
            _vspec((nb, cout), lambda i: (0, 0)),
            _vspec((nb, cout), lambda i: (0, 0)),
        ],
        out_specs=[
            _vspec((tile, cin), lambda i: (i, 0)),
            _vspec((cin, cout), lambda i: (0, 0)),
            _vspec((1, cout), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
            _vspec((1, cin), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cin), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((cin, cout), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cout), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cin), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cin), jnp.float32, vma=vma),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        x,
        mu.reshape(1, cin), inv.reshape(1, cin),
        gamma.reshape(1, cin), beta.reshape(1, cin),
        w, y,
        ds1.reshape(1, cout), ds2.reshape(1, cout),
        pval, idx,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_global_pool_block(
    x, mu, inv, gamma, beta, w, b, sign,
    rows_per_batch: int, tile: int, out_dtype=jnp.bfloat16,
):
    """Fused [bn5-normalize -> relu -> matmul -> stats -> sign-pool].

    x: (N, Cin) raw conv5 output; mu/inv/gamma/beta: (Cin,) bn5 terms;
    w: (Cin, Cout); b: (Cout,); sign: (Cout,) f32 = sign(gamma_global)
    (pass through ``lax.stop_gradient``). N = B * rows_per_batch and
    rows_per_batch % tile == 0 (rows of one tile share a batch row).

    Returns (s1/s2 (Cout,) f32 column sums of the raw global activation
    y and y^2, best (B, Cout) f32 = max over the batch row of sign * y,
    idx (B, Cout) int32 = FIRST row achieving it — torch.max ties).
    The (N, Cout) y itself never leaves the op: it is written once as a
    backward residual and has no downstream consumer.
    """
    (s1, s2, best, idx), _ = _gpb_fwd(
        x, mu, inv, gamma, beta, w, b, sign, rows_per_batch, tile, out_dtype
    )
    return s1, s2, best, idx


def _gpb_fwd(x, mu, inv, gamma, beta, w, b, sign, rows_per_batch, tile,
             out_dtype):
    y, s1, s2, best, idx = _fwd_pallas(
        x, mu, inv, gamma, beta, w, b, sign, rows_per_batch, tile, out_dtype
    )
    return (s1, s2, best, idx), (x, mu, inv, gamma, beta, w, y, sign, idx)


def _gpb_bwd(rows_per_batch, tile, out_dtype, res, ct):
    x, mu, inv, gamma, beta, w, y, sign, idx = res
    ds1, ds2, dbest, _didx = ct
    ds1 = ds1.astype(jnp.float32)
    ds2 = ds2.astype(jnp.float32)
    # d best / d y at the winner row = sign  (best = max sign * y)
    pval = dbest.astype(jnp.float32) * sign.reshape(1, -1).astype(jnp.float32)
    dx, dw, db, dg_like, dbta_like = _bwd_pallas(
        x, mu, inv, gamma, beta, w, y, ds1, ds2, pval, idx,
        rows_per_batch, tile,
    )
    dg_like = dg_like.reshape(-1)
    dbta_like = dbta_like.reshape(-1)
    dmu = -gamma * inv * dbta_like
    dinv = gamma * dg_like / inv
    return (
        dx, dmu, dinv, dg_like, dbta_like, dw, db.reshape(-1),
        jnp.zeros_like(sign),
    )


fused_global_pool_block.defvjp(_gpb_fwd, _gpb_bwd)
