"""Pallas dropout: hardware-PRNG masks instead of threefry.

The reference's dropout is ``nn.Dropout(0.3)`` applied twice in the head
(pcs.py:96, 124, 126). In JAX, ``jax.random.bernoulli`` runs the threefry
block cipher on the VPU — measured at ~5 ms of a 34 ms PointNet train
step for the two (B, M, 512/256) masks. The TPU has a hardware PRNG
(`pltpu.prng_random_bits`) that generates the mask bits ~for free in a
Pallas kernel.

Design:
- keep-decision: ``random_uint32 >= rate * 2^32`` — exact-threshold
  Bernoulli on raw bits, no float conversion;
- the kernel is seeded per grid tile with ``seed + program_id`` so tiles
  draw independent streams;
- custom VJP REGENERATES the mask from the same seed in the backward pass
  (recompute beats storing a (B, M, C) mask in HBM);
- falls back to ``jax.random.bernoulli`` off-TPU (CPU tests, interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 512


def _mask_mul_kernel(seed_ref, x_ref, out_ref, *, threshold, scale, invert):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = pltpu.bitcast(bits, jnp.uint32) >= jnp.uint32(threshold)
    x = x_ref[:]
    out_ref[:] = jnp.where(keep, x * jnp.asarray(scale, x.dtype), 0.0)


def _run(x2d, seed, rate):
    rows, cols = x2d.shape
    tile = min(_TILE_ROWS, rows)
    grid = pl.cdiv(rows, tile)
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    scale = 1.0 / (1.0 - rate)
    kernel = functools.partial(
        _mask_mul_kernel, threshold=threshold, scale=scale, invert=False
    )
    # inside shard_map (check_vma) the output inherits the input's
    # varying-mesh-axes type
    vma = getattr(jax.typeof(x2d), "vma", frozenset())
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype, vma=vma),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_dropout(x: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    """Dropout with TPU-hardware PRNG. seed: (1,) int32; rate: python float."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    return _run(x2d, seed, rate).reshape(shape)


def _fwd(x, seed, rate):
    return pallas_dropout(x, seed, rate), (seed,)


def _bwd(rate, res, g):
    (seed,) = res
    # same seed -> same mask; scaling applies to the cotangent identically
    shape = g.shape
    g2d = g.reshape(-1, shape[-1])
    return _run(g2d, seed, rate).reshape(shape), None


pallas_dropout.defvjp(_fwd, _bwd)


def dropout(x: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, jax.random elsewhere.

    ``key`` is a standard JAX PRNG key; on the TPU path it is reduced to a
    32-bit seed for the hardware generator.
    """
    if rate <= 0.0:
        return x
    if jax.default_backend() == "tpu":  # trace-time static dispatch
        seed = jax.random.bits(key, (1,), jnp.uint32).astype(jnp.int32)
        return pallas_dropout(x, seed, rate)
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
