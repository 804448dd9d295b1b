"""Tap-fused one-hot plane kernels for voxelize / devoxelize.

The matmul formulations of voxelize and trilinear devoxelize
(ops/voxel.py) factorize the per-point one-hot over R^3 into a zy-plane
matrix ``A[p, z*R+y]`` and an x/channel line matrix, then contract on
the MXU. The first-generation kernels here still took the tap
*indices/weights* from XLA and left the x/channel expansion outside,
which cost a chain of small badly-laid-out index arrays plus a full
(B, M, R*C) HBM operand per call (~1.5 ms of the 64^3 step in the r3
xplane profile: the reshape.51xx/pad_add index prep, the devox
forward's 67 MB f32 x-line output + layout copy + reduce, the devox
backward's 33 MB cotangent expansion). This generation moves the whole
per-point pipeline into VMEM: each kernel takes the raw per-point
coordinates (continuous voxel coords ``u`` for trilinear, the flat
voxel id for voxelize) and builds taps, one-hot planes, AND the
x/channel line operand tile-by-tile next to the MXU. Nothing but the
(B, M, small) point arrays and the (B, R^2, R*N) grid touch HBM.

Three kernels cover all call sites (ops/voxel.py gates them on
TPU + R<=64 — the Pallas HLO interpreter can't run under vma-typed
shard_map, and R<=64 keeps the (R^2, N) VMEM blocks comfortable):

- ``voxelize_contract``  : sums[zy, x*C+k] = sum_p 1[zy==zy_p, x==x_p] f[p,k]
  (voxelize forward — T=1 one-hot from the flat voxel id).
- ``trilinear_scatter``  : dgrid2[zy, x*C+k] = sum_p A[p,zy] Wx[p,x] go[p,k]
  (devoxelize backward's grid cotangent).
- ``trilinear_gather``   : out[p, k] = sum_{zy,x} A[p,zy] Wx[p,x] g2[zy, x*C+k]
  (devoxelize forward — the 2-tap x interpolation rides the kernel
  epilogue, so the output is the final (B, M, C), not the x-line).

Tap semantics match ops/voxel.py's XLA formulation exactly: per-axis
2-tap clip to [0, R-1], duplicate taps at clipped edges accumulated in
f32 and rounded to bf16 once (``_zy_plane``), bf16 operand products in
the same order. Masked / spill points carry a sentinel id >= R^2
(voxelize) or a zero mask lane (trilinear), whose rows are identically
zero. No VJP: voxelize is upstream of all parameters, and the devox
kernels live inside devoxelize's hand-written VJP.

Reference xplane numbers (B8 x 8192 pts, R64, C4, 64^3 step) for the
index-fed generation these replace: devox fwd 0.96 ms kernel + ~0.55 ms
x-interp glue; devox bwd 1.08 + ~0.25 operand build; voxelize 0.76 +
~0.7 index prep. See BASELINE.md for post-fusion step numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp(flag) -> bool:
    return jax.default_backend() != "tpu" if flag is None else bool(flag)


def _compiler_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _axis_taps(u1, r):
    """One axis' 2-tap (index, weight) pairs from continuous coords.

    Same clipping as ops/voxel._axis_weights: voxel i covers [i, i+1);
    both taps clip to [0, R-1], so clipped edges produce duplicate
    indices whose weights the callers accumulate in f32."""
    i0 = jnp.floor(u1)
    frac = (u1 - i0).astype(jnp.float32)
    i0 = i0.astype(jnp.int32)
    t0 = jnp.clip(i0, 0, r - 1)
    t1 = jnp.clip(i0 + 1, 0, r - 1)
    return ((t0, 1.0 - frac), (t1, frac))


def _zy_plane(u, r, transposed=False):
    """Trilinear zy tap matrix (Mc, R^2) bf16 from (Mc, >=2) coords.

    ``transposed`` builds (R^2, Mc) directly — the point-contracting
    kernels' matmul wants the plane axis as lhs rows, and building it
    transposed beats handing Mosaic a transposed-contraction dot.
    Duplicate taps (clipped edges) accumulate in f32, rounded to bf16
    once — the XLA _axis_weights sum-then-cast order."""
    mc = u.shape[0]
    shape = (r * r, mc) if transposed else (mc, r * r)
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if transposed else 1)
    a = jnp.zeros(shape, jnp.float32)
    for iz, wz in _axis_taps(u[:, 0], r):
        for iy, wy in _axis_taps(u[:, 1], r):
            idx = iz * r + iy
            w = wz * wy
            ik = idx[None, :] if transposed else idx[:, None]
            wk = w[None, :] if transposed else w[:, None]
            a = a + jnp.where(iota == ik, wk, 0.0)
    return a.astype(jnp.bfloat16)


def _xline_weights(u1, r, c):
    """(Mc, R*C) x-interpolation line: out[p, x*c+k] = Wx[p, x], f32."""
    mc = u1.shape[0]
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (mc, r * c), 1) // c
    a = jnp.zeros((mc, r * c), jnp.float32)
    for ix, wx in _axis_taps(u1, r):
        a = a + jnp.where(lane_x == ix[:, None], wx[:, None], 0.0)
    return a


def _lane_tile(vals, r):
    """(Mc, C) -> (Mc, R*C): out[p, x*c+k] = vals[p, k] (x-major tile).

    Implemented as a 0/1 placement matmul — a per-class
    ``where(lane%c == k, vals[:, k, None], 0)`` chain needs an i1 mask
    relayout (lane-varying mask vs lane-replicated value column) that
    Mosaic rejects. Placement through the f32 MXU accumulator moves the
    values verbatim (one 0/1 hit per output column)."""
    mc, c = vals.shape
    rowk = jax.lax.broadcasted_iota(jnp.int32, (c, r * c), 0)
    colk = jax.lax.broadcasted_iota(jnp.int32, (c, r * c), 1) % c
    t = (rowk == colk).astype(vals.dtype)
    return jax.lax.dot_general(
        vals, t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(vals.dtype)


def _chunked(b, m, chunk, arrs, pad_values):
    """Pad the point axis to a chunk multiple and reshape to
    (B, nc, chunk, t). Returns (nc, new_arrs)."""
    out = []
    if m % chunk:
        pad = chunk - m % chunk
        arrs = [
            jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2),
                    constant_values=v)
            for a, v in zip(arrs, pad_values)
        ]
        m += pad
    nc = m // chunk
    for a in arrs:
        out.append(a.reshape((b, nc, chunk) + a.shape[2:]))
    return nc, out


# ---------------------------------------------------------------------------
# voxelize forward: one-hot scatter-sum as a contraction
# ---------------------------------------------------------------------------

def _vox_contract_kernel(flat_ref, ext_ref, out_ref, *, r, c1):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    flat = flat_ref[0, 0][:, 0]                       # (Mc,) int32
    fz = flat // (r * r)                              # == r for sentinel
    fy = (flat // r) % r
    fx = flat % r
    izy = fz * r + fy                                 # sentinel -> R^2
    mc = flat.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r * r, mc), 0)
    a_t = (iota == izy[None, :]).astype(jnp.bfloat16)
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (mc, r * c1), 1) // c1
    ext_t = _lane_tile(ext_ref[0, 0], r)              # (Mc, R*C1) bf16
    d1 = jnp.where(lane_x == fx[:, None], ext_t, jnp.bfloat16(0))
    out_ref[0] += jax.lax.dot_general(
        a_t, d1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def voxelize_contract(flat, ext, r, *, chunk=512, interpret=None):
    """sums[zy, x*C+k] = sum_p [zy_p==zy][x_p==x] ext[p, k] -> f32.

    flat: (B, M) int32 flat voxel ids, ``R^3`` sentinel for masked
    points (its z one-hot row lands at the R^2 sentinel plane id and
    contributes nothing); ext: (B, M, C) feature values (masked rows
    must already be zero). Returns (B, R^2, R*C) f32 — the raw layout
    ``_voxelize_matmul_raw`` documents."""
    b, m = flat.shape
    c1 = ext.shape[-1]
    nc, (flat, ext) = _chunked(
        b, m, chunk,
        [flat[..., None].astype(jnp.int32), ext.astype(jnp.bfloat16)],
        [r * r * r, 0],
    )
    vma = getattr(jax.typeof(ext), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((b, r * r, r * c1), jnp.float32,
                                     vma=vma)
    return pl.pallas_call(
        functools.partial(_vox_contract_kernel, r=r, c1=c1),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, c1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * r, r * c1), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(flat, ext)


# ---------------------------------------------------------------------------
# devoxelize backward: trilinear scatter of the point cotangents
# ---------------------------------------------------------------------------

def _tri_scatter_kernel(u_ref, go_ref, out_ref, *, r, c):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    u = u_ref[0, 0]                                   # (Mc, 3) f32
    a_t = _zy_plane(u, r, transposed=True)            # (R^2, Mc) bf16
    wx = _xline_weights(u[:, 2], r, c).astype(jnp.bfloat16)
    go_t = _lane_tile(go_ref[0, 0], r)                # (Mc, R*C) bf16
    out_ref[0] += jax.lax.dot_general(
        a_t, wx * go_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def trilinear_scatter(u, go, r, *, chunk=512, interpret=None):
    """dgrid2[zy, x*C+k] = sum_p A[p, zy] Wx[p, x] go[p, k] -> f32.

    u: (B, M, 3) continuous voxel coords (``_trilinear_u``; masked
    points pinned finite); go: (B, M, C) cotangents, masked rows
    already zero. Returns (B, R^2, R*C) f32 — the devoxelize grid2
    cotangent. Operand products are bf16 like the XLA formulation
    (``wx.astype(bf16) * go.astype(bf16)``)."""
    b, m = u.shape[:2]
    c = go.shape[-1]
    nc, (u, go) = _chunked(
        b, m, chunk,
        [u.astype(jnp.float32), go.astype(jnp.bfloat16)],
        [0, 0],
    )
    vma = getattr(jax.typeof(go), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((b, r * r, r * c), jnp.float32,
                                     vma=vma)
    return pl.pallas_call(
        functools.partial(_tri_scatter_kernel, r=r, c=c),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * r, r * c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(u, go)


# ---------------------------------------------------------------------------
# generic (row, col) one-hot scatter-sum — the sparse readout backward
# ---------------------------------------------------------------------------

def _rowcol_scatter_kernel(row_ref, col_ref, vals_ref, out_ref,
                           *, nrows, ncols, c):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    row = row_ref[0, 0][:, 0]                         # (Mc,) int32
    col = col_ref[0, 0][:, 0]
    mc = row.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, mc), 0)
    a_t = (iota == row[None, :]).astype(jnp.bfloat16)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (mc, ncols * c), 1) // c
    vt = _lane_tile(vals_ref[0, 0], ncols)            # (Mc, ncols*C) bf16
    d1 = jnp.where(lane_col == col[:, None], vt, jnp.bfloat16(0))
    out_ref[0] += jax.lax.dot_general(
        a_t, d1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def rowcol_scatter(rows, cols, vals, nrows, ncols, *, chunk=512,
                   interpret=None):
    """out[r, col*C+k] = sum_p 1[rows_p==r, cols_p==col] vals[p, k] -> f32.

    rows/cols: (B, M) int32 — a row id >= nrows (sentinel) contributes
    nothing; vals: (B, M, C) (bf16-rounded operands, f32 MXU
    accumulation). Returns (B, nrows, ncols*C) f32. This is the
    two-index generalization of ``voxelize_contract``: the block-sparse
    point-readout backward scatters per-point cotangents into
    (tile slot, intra-voxel) cells — a per-row scatter-add that
    serializes on TPU when XLA transposes the readout gather."""
    b, m = rows.shape
    c = vals.shape[-1]
    nc, (rows, cols, vals) = _chunked(
        b, m, chunk,
        [rows[..., None].astype(jnp.int32),
         cols[..., None].astype(jnp.int32),
         vals.astype(jnp.bfloat16)],
        [nrows, 0, 0],
    )
    vma = getattr(jax.typeof(vals), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((b, nrows, ncols * c), jnp.float32,
                                     vma=vma)
    return pl.pallas_call(
        functools.partial(_rowcol_scatter_kernel, nrows=nrows, ncols=ncols,
                          c=c),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, ncols * c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(rows, cols, vals)


# ---------------------------------------------------------------------------
# devoxelize forward: trilinear gather with the x-interp in the epilogue
# ---------------------------------------------------------------------------

def _tri_gather_kernel(u_ref, g_ref, out_ref, *, r, c):
    u = u_ref[0, 0]                                   # (Mc, 4) f32
    a = _zy_plane(u, r)                               # (Mc, R^2) bf16
    t = jax.lax.dot_general(
        a, g_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (Mc, R*C) f32
    tw = t * _xline_weights(u[:, 2], r, c)
    mc = u.shape[0]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (mc, r * c), 1) % c
    # per-class masked lane sums keep the x reduction in f32 (a tiled-
    # identity matmul would round the products to bf16); C is small at
    # every call site (class logits)
    cols = [
        jnp.sum(jnp.where(lane_k == k, tw, 0.0), axis=1, keepdims=True)
        for k in range(c)
    ]
    out = jnp.concatenate(cols, axis=1)               # (Mc, C) f32
    out_ref[0, 0] = out * u[:, 3][:, None]            # mask lane


def trilinear_gather(u, mask, g2, *, chunk=512, interpret=None):
    """out[p, k] = mask[p] * sum_{zy,x} A[p,zy] Wx[p,x] g2[zy, x*C+k].

    u: (B, M, 3) continuous voxel coords; mask: (B, M) bool;
    g2: (B, R^2, R*C) grid2 values (bf16-rounded operand like the XLA
    formulation). The 2-tap x interpolation runs in the kernel epilogue
    in f32, so the output is the final (B, M, C) f32 — the (B, M, R*C)
    x-line never touches HBM."""
    b, m = u.shape[:2]
    rr, rc = g2.shape[-2:]
    import math

    r = math.isqrt(rr)
    c = rc // r
    u4 = jnp.concatenate(
        [u.astype(jnp.float32), mask[..., None].astype(jnp.float32)],
        axis=-1,
    )
    nc, (u4,) = _chunked(b, m, chunk, [u4], [0])
    vma = getattr(jax.typeof(g2), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((b, nc, chunk, c), jnp.float32,
                                     vma=vma)
    out = pl.pallas_call(
        functools.partial(_tri_gather_kernel, r=r, c=c),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rr, rc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(u4, g2.astype(jnp.bfloat16))
    return out.reshape(b, nc * chunk, c)[:, :m]
