"""Fused [normalize -> ReLU -> per-batch global max pool] Pallas op.

The reference's only cross-point op (``torch.max`` over the point axis,
pcs.py:114) sits between the global_feat layer and the segmentation head.
In the fused chain its XLA formulation was the single biggest off-roofline
cost: normalize+ReLU materializes an (N, 1024) f32 tensor, the max reads
it back, and the max VJP re-reads it plus writes an (N, 1024) cotangent —
~2.5 GB of HBM traffic per step at B64xM2048. This op does the whole
thing in ~2 passes over the bf16 activations:

forward (one Pallas kernel, one read of y):
    z  = (y - mu) * inv * gamma + beta      # BN normalize, given stats
    zr = relu(z)
    g[b]   = max over the batch row's points of zr     (f32, (B, C))
    idx[b] = FIRST row index achieving that max        (int32, (B, C))

backward (closed-form on (B, C) arrays + one write-only Pallas kernel):
    the winner index makes every cotangent a (B, C) expression —
    dz = dg * (g > 0); x_hat at the winner = (g - beta) / gamma;
    dy is a one-hot scatter of dz * gamma * inv to the winner rows
    (write-only kernel: no re-read of y).

Semantics note: gradient routes to the FIRST max position (torch.max
semantics). XLA's ``jnp.max`` VJP instead splits ties evenly; ties only
arise between identical padded rows, where the reference (torch) also
picks a single index.

ReLU >= 0 guarantees every pooled max is >= 0, so the accumulator
initializes to 0 rather than -inf; a batch row whose features are all
non-positive pools to exactly 0 (matching relu-then-max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # plain int: jnp constants would be captured by the kernel


def _fwd_kernel(y_ref, mu_ref, inv_ref, gamma_ref, beta_ref, g_ref, idx_ref,
                *, tiles_per_batch: int, tile: int):
    # g_ref/idx_ref are FULL (B, C) blocks (0.25 MB each at B64xC1024):
    # they stay VMEM-resident across the whole grid and are row-indexed
    # dynamically, sidestepping the (1, C) sub-block tiling constraint.
    i = pl.program_id(0)
    b = i // tiles_per_batch
    z = (y_ref[:].astype(jnp.float32) - mu_ref[0]) * inv_ref[0]
    z = z * gamma_ref[0] + beta_ref[0]
    zr = jnp.maximum(z, 0.0)

    tile_max = jnp.max(zr, axis=0)                           # (C,)
    # first row achieving the tile max (iota+min; argmax-free)
    rows = jax.lax.broadcasted_iota(jnp.int32, zr.shape, 0)
    tile_arg = jnp.min(jnp.where(zr == tile_max, rows, _BIG), axis=0)
    row_base = (i % tiles_per_batch) * tile

    @pl.when(i % tiles_per_batch == 0)
    def _():
        g_ref[b, :] = jnp.zeros_like(tile_max)
        idx_ref[b, :] = jnp.zeros_like(tile_arg)

    upd = tile_max > g_ref[b, :]
    g_ref[b, :] = jnp.where(upd, tile_max, g_ref[b, :])
    idx_ref[b, :] = jnp.where(upd, tile_arg + row_base, idx_ref[b, :])


def _bwd_scatter_kernel(idx_ref, val_ref, dy_ref, *, tiles_per_batch: int,
                        tile: int):
    i = pl.program_id(0)
    b = i // tiles_per_batch
    row_base = (i % tiles_per_batch) * tile
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, dy_ref.shape, 0) + row_base
    )
    dy_ref[:] = jnp.where(
        rows == idx_ref[b, :], val_ref[b, :], 0.0
    ).astype(dy_ref.dtype)


def _pick_pool_tile(m: int, c: int) -> int:
    """Largest row tile dividing m whose f32 intermediates (z, zr, masks
    ~16 B/row/channel) plus double-buffered bf16 input stay well under the
    16 MB VMEM scoped limit."""
    cap = max(8, (6 * 1024 * 1024) // (c * 16))
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= cap and m % t == 0 and t <= m:
            return t
    return m


def _fwd_pallas(y, mu, inv, gamma, beta, rows_per_batch):
    n, c = y.shape
    b = n // rows_per_batch
    tile = _pick_pool_tile(rows_per_batch, c)
    tpb = rows_per_batch // tile
    grid = n // tile
    vma = getattr(jax.typeof(y), "vma", frozenset())

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    g, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_per_batch=tpb, tile=tile),
        grid=(grid,),
        in_specs=[
            vspec((tile, c), lambda i: (i, 0)),
            vspec((1, c), lambda i: (0, 0)),
            vspec((1, c), lambda i: (0, 0)),
            vspec((1, c), lambda i: (0, 0)),
            vspec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            vspec((b, c), lambda i: (0, 0)),
            vspec((b, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((b, c), jnp.int32, vma=vma),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        y,
        mu.reshape(1, c),
        inv.reshape(1, c),
        gamma.reshape(1, c),
        beta.reshape(1, c),
    )
    return g, idx


def _bwd_pallas(idx, val, n, dtype):
    b, c = idx.shape
    rows_per_batch = n // b
    tile = _pick_pool_tile(rows_per_batch, c)
    tpb = rows_per_batch // tile
    vma = getattr(jax.typeof(val), "vma", frozenset())

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _bwd_scatter_kernel, tiles_per_batch=tpb, tile=tile
        ),
        grid=(n // tile,),
        in_specs=[
            vspec((b, c), lambda i: (0, 0)),
            vspec((b, c), lambda i: (0, 0)),
        ],
        out_specs=vspec((tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), dtype, vma=vma),
        interpret=jax.default_backend() != "tpu",
    )(idx, val)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_global_pool(y, mu, inv, gamma, beta, rows_per_batch: int):
    """(N, C) raw pre-norm activations -> (B, C) pooled features.

    ``y`` rows are grouped per batch element (N = B * rows_per_batch,
    contiguous). mu/inv/gamma/beta: (C,) f32 batch-norm terms. Returns
    max over each group of relu((y - mu) * inv * gamma + beta), f32.
    """
    g, _ = _fwd_pallas(y, mu, inv, gamma, beta, rows_per_batch)
    return g


def _pool_fwd(y, mu, inv, gamma, beta, rows_per_batch):
    g, idx = _fwd_pallas(y, mu, inv, gamma, beta, rows_per_batch)
    # residuals must be JAX types: a zero-size probe carries y's dtype
    probe = jnp.zeros((0,), y.dtype)
    return g, (idx, g, mu, inv, gamma, beta, probe)


def _pool_bwd(rows_per_batch, res, dg):
    idx, g, mu, inv, gamma, beta, probe = res
    n = idx.shape[0] * rows_per_batch
    ydtype = probe.dtype
    # cotangent on zr at the winner; zero when the pooled max is 0
    # (all-non-positive z: relu clamps, or the guard init won)
    dz = jnp.where(g > 0.0, dg, 0.0)                       # (B, C)
    # x_hat at the winner, recovered from g: z = x_hat*gamma + beta = g
    # (winner has z > 0 so relu is identity). Guard gamma ~ 0: the channel
    # is constant, dgamma's x_hat factor is undefined; contribute 0.
    safe_gamma = jnp.where(jnp.abs(gamma) > 1e-12, gamma, 1.0)
    x_hat_w = jnp.where(
        jnp.abs(gamma) > 1e-12, (g - beta) / safe_gamma, 0.0
    )
    dgamma_like = jnp.sum(dz * x_hat_w, axis=0)            # (C,)
    dbeta_like = jnp.sum(dz, axis=0)                       # (C,)
    dgamma = dgamma_like
    dbeta = dbeta_like
    dmu = -gamma * inv * dbeta_like
    dinv = gamma * dgamma_like / inv
    val = dz * (gamma * inv)                               # (B, C)
    dy = _bwd_pallas(idx, val, n, ydtype)
    return dy, dmu, dinv, dgamma, dbeta


fused_global_pool.defvjp(_pool_fwd, _pool_bwd)
