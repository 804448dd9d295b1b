"""Fused 3x3x3 conv block for the voxel U-Net — lane-packed block matmuls.

Why: XLA's conv_general_dilated at U-Net widths (C=16..64, channels-last)
runs ~20x off roofline on TPU (measured 4.0 ms vs ~0.2 ms compute /
~0.4 ms HBM floor at B8 x 64^3 x 16ch — experiments/bench_conv3d_variants).
The pathology is lane utilization: C=16 arrays fill 16 of 128 vector
lanes and the implicit GEMM has N=16.

Design (TPU-first, no reference counterpart — the reference's model is a
PointNet; this serves the north-star voxel U-Net, BASELINE.json configs
2/3):

- View the NDHWC grid as ``(B, D, H*U, 128)`` where ``U = W / P`` and
  ``P = 128 / C`` positions are packed per 128-lane block. This is a
  contiguous reinterpretation — zero data movement, zero lane padding.
- The 3^3 conv then decomposes into
    * 9 "main" matmuls — for each (dz, dy) tap, the row-shifted slab
      times a (128, 128) block-banded weight covering dx in {-1, 0, +1}
      WITHIN the lane block (full MXU K/N utilization), plus
    * 1 compact "edge" matmul — a (rows, 9*2C) patch of the C-lane
      columns that cross the 8-position block boundary, times a
      (9*2C, 128) weight.
  FLOP inflation vs the dense conv is (9*128 + 9*2C) * 128 /
  (27 * C * C) = 2.7x at C=16 (less at wider C), repaying itself ~8x
  in MXU utilization.
- The per-element ``relu(x * scale + shift)`` PROLOGUE (the folded
  GroupNorm of the previous layer) is applied on the fly when slabs are
  read, so normalization/activation never round-trips HBM.
- dz = ±1 slabs arrive as two extra views of the same input array with
  shifted-and-clamped index maps; boundary validity is a scalar mask.

The custom VJP currently recomputes the backward through an XLA
composition of the same math (conv_general on the activated input);
forward is the hot path in serving and the step's profile. A hand-written
Pallas backward (transposed-tap dgrad reusing this kernel + a wgrad
accumulation kernel) is the follow-up.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ---------------------------------------------------------------------------
# weight packing (differentiable jnp so grads flow to the raw (3,3,3,C,C) w)
# ---------------------------------------------------------------------------

def _placement(p: int) -> jnp.ndarray:
    """(3, P, P) binary: M[dx+1, i, j] = 1 iff input pos i feeds output
    pos j within the lane block, i.e. j == i - dx."""
    import numpy as np

    m = np.zeros((3, p, p), np.float32)
    for dx in (-1, 0, 1):
        for i in range(p):
            j = i - dx
            if 0 <= j < p:
                m[dx + 1, i, j] = 1.0
    return jnp.asarray(m)


def pack_weights(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """w: (3, 3, 3, C, C) DHWIO -> (wm (9*128, 128), we (9*2C, 128))."""
    c = w.shape[-1]
    p = LANES // c
    w9 = w.reshape(9, 3, c, c)                     # (tap, dx, ci, co)
    m = _placement(p)                              # (dx, i, j)
    wm = jnp.einsum("xij,txab->tiajb", m, w9)      # (9, P, C, P, C)
    wm = wm.reshape(9 * LANES, LANES)
    # edges: side 0 = input i=P-1 of block u-1 feeds output j=0 (dx=-1);
    #        side 1 = input i=0   of block u+1 feeds output j=P-1 (dx=+1)
    we = jnp.zeros((9, 2, c, p, c), w.dtype)
    we = we.at[:, 0, :, 0, :].set(w9[:, 0])
    we = we.at[:, 1, :, p - 1, :].set(w9[:, 2])
    return wm, we.reshape(9 * 2 * c, LANES)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _shift_rows(slab: jax.Array, k: int) -> jax.Array:
    """out[r] = slab[r + k], zero-padded at the ends (static k)."""
    if k == 0:
        return slab
    rows = slab.shape[0]
    z = jnp.zeros((abs(k), slab.shape[1]), slab.dtype)
    if k > 0:
        return jnp.concatenate([slab[k:], z], axis=0)
    return jnp.concatenate([z, slab[:k]], axis=0)


def _kernel(
    xm_ref, x0_ref, xp_ref, scale_ref, shift_ref, wm_ref, we_ref, bias_ref,
    y_ref,
    *, h: int, u: int, c: int, activate: bool,
):
    rows = h * u
    d = pl.program_id(1)
    nd = pl.num_programs(1)

    def prep(ref, valid):
        s = ref[0, 0].astype(jnp.float32)
        if activate:
            s = jnp.maximum(s * scale_ref[0, 0] + shift_ref[0, 0], 0.0)
        return (s * valid).astype(jnp.bfloat16)

    one = jnp.float32(1.0)
    slabs = [
        prep(xm_ref, jnp.where(d > 0, one, 0.0)),
        prep(x0_ref, one),
        prep(xp_ref, jnp.where(d < nd - 1, one, 0.0)),
    ]

    acc = jnp.zeros((rows, LANES), jnp.float32)
    t = 0
    for slab in slabs:
        for dy in (-1, 0, 1):
            sh = _shift_rows(slab, dy * u)
            acc = acc + jnp.dot(
                sh, wm_ref[t * LANES : (t + 1) * LANES],
                preferred_element_type=jnp.float32,
            )
            t += 1

    # edge patch: the C lanes crossing the lane-block boundary
    uid = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0) % u
    chunks = []
    for slab in slabs:
        for dy in (-1, 0, 1):
            left = _shift_rows(slab, dy * u - 1)[:, LANES - c :]
            chunks.append(jnp.where(uid == 0, 0.0, left))
            right = _shift_rows(slab, dy * u + 1)[:, :c]
            chunks.append(jnp.where(uid == u - 1, 0.0, right))
    pe = jnp.concatenate(chunks, axis=1)           # (rows, 18C)
    acc = acc + jnp.dot(pe, we_ref[:], preferred_element_type=jnp.float32)

    acc = acc + bias_ref[0]
    y_ref[0, 0] = acc.astype(y_ref.dtype)


def _conv_pallas(
    x: jax.Array, wm: jax.Array, we: jax.Array, bias_lane: jax.Array,
    scale: jax.Array, shift: jax.Array,
    *, activate: bool, interpret: bool,
) -> jax.Array:
    b, d, h, w, c = x.shape
    p = LANES // c
    u = w // p
    rows = h * u
    xv = x.reshape(b, d, rows, LANES)

    spec = lambda fd: pl.BlockSpec(  # noqa: E731
        (1, 1, rows, LANES),
        functools.partial(lambda fd, i, j: (i, fd(j), 0, 0), fd),
        memory_space=pltpu.VMEM,
    )
    bspec = pl.BlockSpec(
        (1, 1, LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_kernel, h=h, u=u, c=c, activate=activate),
        grid=(b, d),
        in_specs=[
            spec(lambda j: jnp.maximum(j - 1, 0)),
            spec(lambda j: j),
            spec(lambda j: jnp.minimum(j + 1, d - 1)),
            bspec,
            bspec,
            wspec,
            wspec,
            pl.BlockSpec((1, 1, LANES), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows, LANES), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16),
        interpret=interpret,
    )(xv, xv, xv, scale[:, None], shift[:, None], wm.astype(jnp.bfloat16),
      we.astype(jnp.bfloat16), bias_lane.reshape(1, 1, LANES))
    return y.reshape(b, d, h, w, c)


# ---------------------------------------------------------------------------
# reference composition (bwd path + parity tests)
# ---------------------------------------------------------------------------

def _act(x, scale, shift, c, activate):
    if not activate:
        return x.astype(jnp.bfloat16)
    b = x.shape[0]
    sc = scale.reshape(b, 1, 1, 1, -1)[..., :c]
    sh = shift.reshape(b, 1, 1, 1, -1)[..., :c]
    return jnp.maximum(
        x.astype(jnp.float32) * sc + sh, 0.0
    ).astype(jnp.bfloat16)


def _conv_ref(x, w, bias, scale, shift, *, activate):
    c = x.shape[-1]
    a = _act(x, scale, shift, c, activate)
    # no explicit f32 output type: mixed-dtype cotangents break the conv
    # transpose under autodiff (same constraint as ops/conv3d.py); the MXU
    # accumulates in f32 regardless
    y = jax.lax.conv_general_dilated(
        a, w.astype(jnp.bfloat16), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return (y.astype(jnp.float32) + bias).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_conv3x3(x, w, bias, scale, shift, activate=True, interpret=False):
    """relu(x * scale + shift) -> 3^3 SAME conv -> + bias, one kernel.

    x: (B, D, H, W, C) bf16 raw previous-layer output. C must divide 128
    and W must be a multiple of 128/C. w: (3, 3, 3, C, C) DHWIO.
    scale/shift: (B, 128) f32 folded GroupNorm (per-lane, C-periodic);
    ignored when ``activate=False``. Returns bf16 (B, D, H, W, C).
    """
    wm, we = pack_weights(w)
    bias_lane = jnp.tile(bias.astype(jnp.float32), LANES // bias.shape[0])
    return _conv_pallas(
        x, wm, we, bias_lane[None], scale, shift,
        activate=activate, interpret=interpret,
    )


def _fwd(x, w, bias, scale, shift, activate, interpret):
    y = fused_conv3x3(x, w, bias, scale, shift, activate, interpret)
    return y, (x, w, bias, scale, shift)


def _bwd(activate, interpret, res, gy):
    x, w, bias, scale, shift = res
    _, vjp = jax.vjp(
        functools.partial(_conv_ref, activate=activate),
        x, w, bias, scale, shift,
    )
    return vjp(gy)


fused_conv3x3.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# GroupNorm folding helpers (stats -> per-lane scale/shift)
# ---------------------------------------------------------------------------

def grid_group_stats(y: jax.Array, groups: int) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, group) mean/var of a (B, D, H, W, C) grid — the same
    statistics group_norm (ops/conv3d.py) computes."""
    b, _, _, _, c = y.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    yf = y.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = jnp.mean(yf, axis=(1, 3))
    var = jnp.mean(jnp.square(yf), axis=(1, 3)) - jnp.square(mean)
    return mean, var


def fold_gn(
    mean: jax.Array, var: jax.Array, gn_scale: jax.Array, gn_bias: jax.Array,
    groups: int, eps: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """Fold GroupNorm into per-lane (B, 128) scale/shift for the kernel
    prologue: relu(x * scale + shift) == relu(GN(x))."""
    c = gn_scale.shape[0]
    g = mean.shape[1]
    inv = jax.lax.rsqrt(var + eps)                       # (B, g)
    per_c_inv = jnp.repeat(inv, c // g, axis=1)          # (B, C)
    per_c_mean = jnp.repeat(mean, c // g, axis=1)
    scale = per_c_inv * gn_scale[None]
    shift = gn_bias[None] - per_c_mean * scale
    reps = LANES // c
    return jnp.tile(scale, (1, reps)), jnp.tile(shift, (1, reps))
