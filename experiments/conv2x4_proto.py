"""Prototype: 2x4 (h x w) lane-tile 3^3 conv kernel vs the 1x8 banded one.

VERDICT r3 item 1 asked for the packed conv's FLOP inflation to be cut by
"packing 2 half-width position groups so the banded weight carries less
zero-fill". This is that formulation, measured standalone at the bench
config (64^3, C=16, B8, bf16, forward):

- lane = hl*64 + wl*16 + c  (2 h-positions x 4 w-positions x 16 ch);
- per dz: ONE r=0 matmul whose (128,128) weight carries the full 3x3
  (dy,dx) stencil within the 2x4 tile (40/64 C^2-blocks nonzero), plus
  ONE merged r=+-1 matmul on a lane-combined operand (lanes 0..63 from
  the row-tile below, 64..127 from above; 20/64 blocks), plus an 8C-wide
  x-edge panel chunk -> one (rows, 24C) panel matmul across dz;
- supplied MACs/voxel: (3*2*128*128 + 384*128)/8 = 18432 vs the 1x8
  design's 23040 (-20%), useful 6912 either way.

Numerics are checked against the XLA SAME conv. The verdict this script
produces (kernel ms at B8/64^3/w16) decides whether the -20% survives
the extra VPU select/panel work — integration would change the packed
layout contract shared by voxelize_packed / down/up / head / devoxelize
grid2 / GP halos, so it must win clearly at the kernel level first.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.pallas.conv3d_block import (  # noqa: E402
    _halo_specs,
    _interp,
    _shift_rows,
    _compiler_params,
    _pick_kd,
    fused_conv3x3_p,
    pack_grid,
)

LANES = 128
C = 16
HL, WL = 2, 4


def pack24(x):
    """(B, D, H, W, 16) -> (B, D, (H/2)*(W/4), 128), lane=hl*64+wl*16+c."""
    b, d, h, w, c = x.shape
    assert c == C and h % HL == 0 and w % WL == 0
    h2, u4 = h // HL, w // WL
    xr = x.reshape(b, d, h2, HL, u4, WL, c)
    xr = xr.transpose(0, 1, 2, 4, 3, 5, 6)
    return xr.reshape(b, d, h2 * u4, LANES), (h2, u4)


def unpack24(xp, h2, u4):
    b, d = xp.shape[:2]
    xr = xp.reshape(b, d, h2, u4, HL, WL, C)
    xr = xr.transpose(0, 1, 2, 4, 3, 5, 6)
    return xr.reshape(b, d, h2 * HL, u4 * WL, C)


def build_weights(w):
    """w (3,3,3,Cin=16,Cout=16) -> (wr0 (3,128,128), wpm (3,128,128),
    wpanel (3*8C, 128)) numpy f32."""
    w = np.asarray(w, np.float32)
    wr0 = np.zeros((3, LANES, LANES), np.float32)
    wpm = np.zeros((3, LANES, LANES), np.float32)
    # 8C panel column order per dz: [left_same_h0, left_same_h1,
    #  left_below(h0), left_above(h1), right_same_h0, right_same_h1,
    #  right_below(h0), right_above(h1)] each C wide
    wpanel = np.zeros((3, 8 * C, LANES), np.float32)
    # conv convention: w[o+1] multiplies the input at offset o = i - j
    # (same as conv3d_block._placement: i = j + dx)
    for zi, dz in enumerate((-1, 0, 1)):
        for jl in range(HL):
            for jw in range(WL):
                for il in range(HL):
                    dy = il - jl
                    for iw in range(WL):
                        dx = iw - jw
                        if abs(dx) <= 1:
                            if abs(dy) <= 1:
                                wr0[zi,
                                    il * 64 + iw * C:il * 64 + iw * C + C,
                                    jl * 64 + jw * C:jl * 64 + jw * C + C,
                                    ] = w[dz + 1, dy + 1, dx + 1]
                # merged r=+-1: lanes 0..63 = below tile's hl=0 (input y
                # offset +1 onto jl=1); lanes 64..127 = above tile's
                # hl=1 (offset -1 onto jl=0)
                for iw in range(WL):
                    dx = iw - jw
                    if abs(dx) <= 1:
                        if jl == 1:
                            wpm[zi, iw * C:iw * C + C,
                                64 + jw * C:64 + jw * C + C] = \
                                w[dz + 1, 2, dx + 1]
                        else:
                            wpm[zi, 64 + iw * C:64 + iw * C + C,
                                jw * C:jw * C + C] = w[dz + 1, 0, dx + 1]
        # x-edge panel: left chunks (provider iw=3 of u-1) feed jw=0 via
        # offset -1; right (iw=0 of u+1) feed jw=3 via +1. y-cases:
        # same-tile h0/h1, below (offset +1 -> jl=1), above (-1 -> jl=0)
        for side, jw, base in ((0, 0, 0), (1, WL - 1, 4 * C)):
            dxw = -1 if side == 0 else 1
            for jl in range(HL):
                # same-tile: il = 0 chunk, il = 1 chunk
                for il in range(HL):
                    dy = il - jl
                    if abs(dy) <= 1:
                        wpanel[zi, base + il * C:base + (il + 1) * C,
                               jl * 64 + jw * C:jl * 64 + jw * C + C] = \
                            w[dz + 1, dy + 1, dxw + 1]
            # below: il=0 of h2+1, offset +1 -> jl=1
            wpanel[zi, base + 2 * C:base + 3 * C,
                   64 + jw * C:64 + jw * C + C] = w[dz + 1, 2, dxw + 1]
            # above: il=1 of h2-1, offset -1 -> jl=0
            wpanel[zi, base + 3 * C:base + 4 * C,
                   jw * C:jw * C + C] = w[dz + 1, 0, dxw + 1]
    return (
        jnp.asarray(wr0.reshape(3 * LANES, LANES), jnp.bfloat16),
        jnp.asarray(wpm.reshape(3 * LANES, LANES), jnp.bfloat16),
        jnp.asarray(wpanel.reshape(24 * C, LANES), jnp.bfloat16),
    )


def _panel_chunks(a, u4, lane_ids):
    """(rows, 8C) x-edge panel for one dz slab (order per build_weights)."""
    rows = a.shape[0]
    uid = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0) % u4
    not_first = jnp.where(uid == 0, 0.0, 1.0).astype(a.dtype)
    not_last = jnp.where(uid == u4 - 1, 0.0, 1.0).astype(a.dtype)
    U = u4
    chunks = []
    # left side: provider wl=3 columns of u-1 readers' neighbor
    left = _shift_rows(a, -1)
    left_bel = _shift_rows(a, U - 1)
    left_abv = _shift_rows(a, -U - 1)
    chunks.append(left[:, 48:64] * not_first)          # same h0
    chunks.append(left[:, 112:128] * not_first)        # same h1
    chunks.append(left_bel[:, 48:64] * not_first)      # below h0
    chunks.append(left_abv[:, 112:128] * not_first)    # above h1
    right = _shift_rows(a, 1)
    right_bel = _shift_rows(a, U + 1)
    right_abv = _shift_rows(a, -U + 1)
    chunks.append(right[:, 0:16] * not_last)
    chunks.append(right[:, 64:80] * not_last)
    chunks.append(right_bel[:, 0:16] * not_last)
    chunks.append(right_abv[:, 64:80] * not_last)
    return jnp.concatenate(chunks, axis=1)


def _kernel24(xm_ref, x0_ref, xp_ref, wr0_ref, wpm_ref, wpanel_ref, y_ref,
              *, kd, u4):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    rows = x0_ref.shape[2]
    lane_lo = jax.lax.broadcasted_iota(
        jnp.int32, (rows, LANES), 1) < 64

    def slab(i):
        if i == 0:
            s = xm_ref[0, 0]
            return jnp.where(j > 0, 1.0, 0.0).astype(s.dtype) * s
        if i <= kd:
            return x0_ref[0, i - 1]
        s = xp_ref[0, 0]
        return jnp.where(j < nj - 1, 1.0, 0.0).astype(s.dtype) * s

    window = [slab(0), slab(1), slab(2)]
    for k in range(kd):
        if k + 1 < kd:
            window.append(slab(k + 3))
        acc = jnp.zeros((rows, LANES), jnp.float32)
        panels = []
        for dz in range(3):
            a = window[k + dz]
            acc = acc + jnp.dot(
                a, wr0_ref[dz * LANES:(dz + 1) * LANES],
                preferred_element_type=jnp.float32,
            )
            comb = jnp.where(
                lane_lo, _shift_rows(a, u4), _shift_rows(a, -u4)
            )
            acc = acc + jnp.dot(
                comb, wpm_ref[dz * LANES:(dz + 1) * LANES],
                preferred_element_type=jnp.float32,
            )
            panels.append(_panel_chunks(a, u4, None))
        acc = acc + jnp.dot(
            jnp.concatenate(panels, axis=1), wpanel_ref[:],
            preferred_element_type=jnp.float32,
        )
        y_ref[0, k] = acc.astype(y_ref.dtype)


def conv24(xp, w, u4, interpret=None):
    b, d, rows, _ = xp.shape
    kd = _pick_kd(d, rows)
    wr0, wpm, wpanel = build_weights(w)
    prev, cur, nxt = _halo_specs(rows, kd, d)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel24, kd=kd, u4=u4),
        grid=(b, d // kd),
        in_specs=[prev, cur, nxt, wspec, wspec, wspec],
        out_specs=pl.BlockSpec((1, kd, rows, LANES),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, xp, xp, wr0, wpm, wpanel)


def check_numerics():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.2, jnp.float32)
    xp, (h2, u4) = pack24(x)
    y = unpack24(conv24(xp, w, u4), h2, u4)
    ref = jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"numerics: max abs err {err:.4f} (scale {scale:.2f})")
    assert err < 0.15 * scale + 0.1, "2x4 kernel mismatch"


def bench():
    B, R = 8, 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, R, R, R, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
    xp24, (h2, u4) = pack24(x)
    xp18, meta = pack_grid(x)
    zeros = jnp.zeros((B, LANES), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def make24(n):
        @jax.jit
        def run(xp):
            y = xp
            for _ in range(n):
                y = conv24(y, w, u4)
            return y
        return run

    def make18(n):
        @jax.jit
        def run(xp):
            y = xp
            for _ in range(n):
                y = fused_conv3x3_p(y, w, bias, zeros, zeros, meta, False,
                                    False)
            return y
        return run

    SHORT, LONG = 8, 40

    def measure(fn, arg):
        out = fn(arg)
        float(out.reshape(-1)[0])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(arg)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    # differential timing cancels the relay's fixed per-call sync
    for name, make, arg in (("2x4", make24, xp24), ("1x8", make18, xp18)):
        t_s = measure(make(SHORT), arg)
        t_l = measure(make(LONG), arg)
        print(f"{name}: {(t_l - t_s) / (LONG - SHORT) * 1e3:.3f} ms per "
              f"conv (differential {LONG}-{SHORT})")


if __name__ == "__main__":
    check_numerics()
    bench()
