"""Fused [LayerNorm -> affine -> ReLU -> active-mask] Pallas kernel.

The sparse-path block stack normalizes every conv output with a
per-site channel LayerNorm, then applies ReLU and masks inactive
voxels (models/sparse_unet.py ``_ln_relu_mask``). As XLA ops that is a
reduce + normalize + select chain re-reading the (N, C) activations
several times per direction; the r4 block-U-Net xplane profile put the
LN chains at ~8 ms of the 45 ms step (fwd+bwd). This kernel does the
whole thing in ONE read and ONE write per direction:

    fwd:  x (N, C) f32 -> out (N, C) out_dtype
          mean/var over C (single-pass moments, same convention as the
          XLA ``_ln_relu_mask``), z = x_hat * scale + bias,
          out = active ? max(z, 0) : 0
    bwd:  one pass recomputes x_hat/z from x and produces
          dx = rstd * (dxhat - mean(dxhat) - x_hat * mean(dxhat*x_hat))
          plus the dscale/dbias column accumulators — nothing but x and
          the (N, 1) active mask is saved between the passes.

Reference counterpart: none (the reference has no sparse path or
LayerNorm; this serves BASELINE.json's sparse north-star component).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024


def _moments(xf, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean),
        0.0,
    )
    return mean, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, act_ref, s_ref, b_ref, y_ref, *, eps, out_dtype):
    xf = x_ref[:].astype(jnp.float32)
    mean, rstd = _moments(xf, eps)
    z = (xf - mean) * rstd * s_ref[0] + b_ref[0]
    out = jnp.where(z > 0.0, z, 0.0) * act_ref[:]
    y_ref[:] = out.astype(out_dtype)


def _bwd_kernel(x_ref, act_ref, s_ref, b_ref, g_ref,
                dx_ref, ds_ref, db_ref, *, eps):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    xf = x_ref[:].astype(jnp.float32)
    mean, rstd = _moments(xf, eps)
    x_hat = (xf - mean) * rstd
    z = x_hat * s_ref[0] + b_ref[0]
    dz = (
        g_ref[:].astype(jnp.float32)
        * jnp.where(z > 0.0, 1.0, 0.0)
        * act_ref[:]
    )
    ds_ref[:] += jnp.sum(dz * x_hat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * s_ref[0]
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - x_hat * jnp.mean(dxhat * x_hat, axis=-1, keepdims=True)
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pick_tile(n: int, tile: int) -> int:
    while tile > 8 and n % tile:
        tile //= 2
    return tile


def _specs(tile, c):
    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return [
        vspec((tile, c), lambda i: (i, 0)),      # x
        vspec((tile, 1), lambda i: (i, 0)),      # active (f32 0/1)
        vspec((1, c), lambda i: (0, 0)),         # scale
        vspec((1, c), lambda i: (0, 0)),         # bias
    ], vspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def ln_relu_mask(x, scale, bias, active,
                 eps: float = 1e-5,
                 out_dtype=jnp.bfloat16,
                 tile: int = DEFAULT_TILE):
    """Fused LN+affine+ReLU+mask. x: (N, C); scale/bias: (C,);
    active: (N,) bool. Returns (N, C) out_dtype. N must be divisible
    by a power-of-two tile >= 8 (true for tile blocks: N = B*NT*t^3)."""
    return _fwd(x, scale, bias, active, eps, out_dtype, tile)[0]


def _fwd(x, scale, bias, active, eps, out_dtype, tile):
    n, c = x.shape
    tile = _pick_tile(n, tile)
    actf = active.astype(jnp.float32).reshape(n, 1)
    vma = getattr(jax.typeof(x), "vma", frozenset())
    in_specs, vspec = _specs(tile, c)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, out_dtype=out_dtype),
        grid=(pl.cdiv(n, tile),),
        in_specs=in_specs,
        out_specs=vspec((tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype, vma=vma),
        interpret=jax.default_backend() != "tpu",
    )(x, actf, scale.reshape(1, c), bias.reshape(1, c))
    return y, (x, scale, bias, actf)


def _bwd(eps, out_dtype, tile, res, g):
    x, scale, bias, actf = res
    n, c = x.shape
    tile = _pick_tile(n, tile)
    vma = getattr(jax.typeof(x), "vma", frozenset())
    in_specs, vspec = _specs(tile, c)
    in_specs.append(vspec((tile, c), lambda i: (i, 0)))   # g
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(pl.cdiv(n, tile),),
        in_specs=in_specs,
        out_specs=[
            vspec((tile, c), lambda i: (i, 0)),
            vspec((1, c), lambda i: (0, 0)),
            vspec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, actf, scale.reshape(1, c), bias.reshape(1, c), g)
    return dx, ds.reshape(c), db.reshape(c), None


ln_relu_mask.defvjp(_fwd, _bwd)
