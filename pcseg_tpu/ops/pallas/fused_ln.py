"""Fused [conv-bias -> LayerNorm -> affine -> ReLU -> active-mask] kernel.

The sparse-path block stack normalizes every conv output with a
per-site channel LayerNorm, then applies ReLU and masks inactive
voxels (models/sparse_unet.py ``_ln_relu_mask``). As XLA ops that is a
reduce + normalize + select chain re-reading the (N, C) activations
several times per direction; the r4 block-U-Net xplane profile put the
LN chains at ~8 ms of the 45 ms step (fwd+bwd). This kernel does the
whole thing in ONE read and ONE write per direction:

    fwd:  x (N, C) -> out (N, C) out_dtype
          xb = x + pre_bias (the upstream conv's bias, folded in),
          mean/var over C (single-pass moments, same convention as the
          XLA ``_ln_relu_mask``), z = xb_hat * scale + bias,
          out = active ? max(z, 0) : 0
    bwd:  one pass recomputes xb_hat/z from x and produces
          dx = rstd * (dxhat - mean(dxhat) - xb_hat * mean(dxhat*xb_hat))
          plus the dscale/dbias/dpre_bias column accumulators — nothing
          but x and the (N, 1) active mask is saved between the passes.

``pre_bias`` exists because the r5 xplane profile showed the block
path's separate [astype(f32) + conv-bias + where(active)] chain costing
~2.6 ms/step on top of the LN kernels, and the f32 intermediate doubled
the LN kernels' input traffic. With the conv feeding its raw bf16
output here, the bias-add happens in f32 INSIDE the kernel (identical
values: the conv output was already bf16 before its f32 upcast) and the
pre-mask select disappears (LN of a masked row is recomputed but
re-masked; gradients at inactive rows are identically zero through the
dz mask). The whole chain is one bf16 read + one bf16 write.

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


def _fwd_kernel(x_ref, act_ref, pb_ref, s_ref, b_ref, y_ref,
                *, eps, out_dtype):
    xf = x_ref[:].astype(jnp.float32) + pb_ref[0]
    mean, rstd = _moments(xf, eps)
    z = (xf - mean) * rstd * s_ref[0] + b_ref[0]
    out = jnp.where(z > 0.0, z, 0.0) * act_ref[:]
    y_ref[:] = out.astype(out_dtype)


def _bwd_kernel(x_ref, act_ref, pb_ref, s_ref, b_ref, g_ref,
                dx_ref, ds_ref, db_ref, dpb_ref, *, eps, n, tile):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dpb_ref[:] = jnp.zeros_like(dpb_ref)

    # Mask out the padding rows of a partial last block: when n % tile
    # != 0 the trailing rows of x/g/act are UNSPECIFIED; without this
    # the dscale/dbias column sums would accumulate garbage (and
    # 0 * NaN would poison them even through the act mask). jnp.where
    # on a bool predicate selects, so NaN padding cannot leak through.
    row = pl.program_id(0) * tile + jax.lax.broadcasted_iota(
        jnp.int32, (tile, 1), 0
    )
    valid = row < n
    xf = jnp.where(valid, x_ref[:].astype(jnp.float32) + pb_ref[0], 0.0)
    mean, rstd = _moments(xf, eps)
    x_hat = (xf - mean) * rstd
    z = x_hat * s_ref[0] + b_ref[0]
    dz = jnp.where(
        valid,
        g_ref[:].astype(jnp.float32)
        * jnp.where(z > 0.0, 1.0, 0.0)
        * act_ref[:],
        0.0,
    )
    ds_ref[:] += jnp.sum(dz * x_hat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * s_ref[0]
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - x_hat * jnp.mean(dxhat * x_hat, axis=-1, keepdims=True)
    )
    # d(pre_bias) = column-sum of d(xb); d(xb) == dx (xb = x + pb)
    dpb_ref[:] += jnp.sum(dx, axis=0, keepdims=True)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pick_tile(n: int, tile: int, c: int) -> int:
    # prefer a tile that divides n (no partial last block); failing
    # that, any power-of-two >= 8 is CORRECT (the bwd kernel row-masks
    # partial blocks), so just bound the VMEM footprint by C
    while tile > 8 and n % tile:
        tile //= 2
    if n % tile:
        tile = max(8, min(DEFAULT_TILE, 2 ** 20 // max(c, 1)))
    return tile


def _compiler_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _interp(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _specs(tile, c):
    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return [
        vspec((tile, c), lambda i: (i, 0)),      # x
        vspec((tile, 1), lambda i: (i, 0)),      # active (f32 0/1)
        vspec((1, c), lambda i: (0, 0)),         # pre_bias
        vspec((1, c), lambda i: (0, 0)),         # scale
        vspec((1, c), lambda i: (0, 0)),         # bias
    ], vspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def bias_ln_relu_mask(x, pre_bias, scale, bias, active,
                      eps: float = 1e-5,
                      out_dtype=jnp.bfloat16,
                      tile: int = DEFAULT_TILE,
                      interpret: bool | None = None):
    """Fused (x + pre_bias) -> LN -> affine -> ReLU -> mask.

    x: (N, C); pre_bias/scale/bias: (C,) f32; active: (N,) bool.
    Returns (N, C) out_dtype. Any N is supported (a partial last block
    is row-masked in the backward kernel). ``interpret=None``
    auto-selects the Pallas interpreter off-TPU; pass True to force it
    (CPU testing of callers' fused branches). The x cotangent is
    returned in x's own dtype (bf16 rounding of cotangents — the
    package-wide backward convention)."""
    return _fwd(x, pre_bias, scale, bias, active,
                eps, out_dtype, tile, interpret)[0]


def ln_relu_mask(x, scale, bias, active,
                 eps: float = 1e-5,
                 out_dtype=jnp.bfloat16,
                 tile: int = DEFAULT_TILE,
                 interpret: bool | None = None):
    """LN+affine+ReLU+mask without a folded pre-bias (zeros)."""
    c = x.shape[-1]
    return bias_ln_relu_mask(
        x, jnp.zeros((c,), jnp.float32), scale, bias, active,
        eps, out_dtype, tile, interpret,
    )


def _fwd(x, pre_bias, scale, bias, active, eps, out_dtype, tile, interpret):
    n, c = x.shape
    tile = _pick_tile(n, tile, c)
    actf = active.astype(jnp.float32).reshape(n, 1)
    vma = getattr(jax.typeof(x), "vma", frozenset())
    in_specs, vspec = _specs(tile, c)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, out_dtype=out_dtype),
        grid=(pl.cdiv(n, tile),),
        in_specs=in_specs,
        out_specs=vspec((tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype, vma=vma),
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(x, actf, pre_bias.reshape(1, c).astype(jnp.float32),
      scale.reshape(1, c), bias.reshape(1, c))
    return y, (x, pre_bias, scale, bias, actf)


def _bwd(eps, out_dtype, tile, interpret, res, g):
    x, pre_bias, scale, bias, actf = res
    n, c = x.shape
    tile = _pick_tile(n, tile, c)
    vma = getattr(jax.typeof(x), "vma", frozenset())
    in_specs, vspec = _specs(tile, c)
    in_specs.append(vspec((tile, c), lambda i: (i, 0)))   # g
    dx, ds, db, dpb = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n=n, tile=tile),
        grid=(pl.cdiv(n, tile),),
        in_specs=in_specs,
        out_specs=[
            vspec((tile, c), lambda i: (i, 0)),
            vspec((1, c), lambda i: (0, 0)),
            vspec((1, c), lambda i: (0, 0)),
            vspec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma),
        ],
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(x, actf, pre_bias.reshape(1, c).astype(jnp.float32),
      scale.reshape(1, c), bias.reshape(1, c), g)
    return (dx, dpb.reshape(c).astype(pre_bias.dtype),
            ds.reshape(c), db.reshape(c), None)


bias_ln_relu_mask.defvjp(_fwd, _bwd)
