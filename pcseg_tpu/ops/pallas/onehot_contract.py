"""Fused one-hot zy-plane contractions for voxelize / devoxelize.

The matmul formulations of voxelize and trilinear devoxelize
(ops/voxel.py) factorize the per-point one-hot over R^3 into a zy-plane
matrix ``A[p, z*R+y]`` and an x/channel matrix, then contract on the
MXU. XLA materializes ``A`` in HBM — (B, M, R^2) bf16 is 512 MB at
B8 x 8192 x R64, and the following dot re-reads it, so each contraction
pays ~1.3 ms of pure HBM traffic for an operand that is a *function of
32 bytes per point* (the r3 xplane profile's broadcast_multiply
fusions). These kernels build ``A`` tile-by-tile in VMEM from the
per-point indices/weights and feed the MXU directly; the one-hot never
touches HBM.

Two shapes cover all three call sites:

- ``plane_contract``  : out[zy, n] = sum_p A[p, zy] * d[p, n]
  (point axis contracted — voxelize forward sums/counts and the
  devoxelize backward's grid cotangent; T weighted taps per point,
  T=1 unit-weight for voxelize, T=4 trilinear for devox-bwd).
- ``plane_gather``    : out[p, n] = sum_zy A[p, zy] * g[zy, n]
  (plane axis contracted — devoxelize forward; the grid operand stays
  VMEM-resident across point chunks).

Masked / spill points carry an index >= R^2 (or a zero weight), whose
one-hot row is identically zero — same sentinel semantics as the XLA
formulation. No VJP: voxelize is upstream of all parameters, and the
devox calls live inside devoxelize's hand-written VJP.

Reference xplane numbers (B8 x 8192 pts, R64, 64^3 step): voxelize
A-materialization 0.73 ms + its dot 0.76 ms; devox-bwd pair 0.73 + 0.86;
devox-fwd 0.78. See BASELINE.md for the post-fusion step numbers.
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


def _build_a(idx_ref, wt_ref, zy, dt, transposed=False):
    """One-hot/weighted plane matrix from (Mc, T) indices.

    ``transposed`` builds (ZY, Mc) directly — the point-contracting
    kernel's matmul wants the plane axis as lhs rows, and building it
    transposed beats handing Mosaic a transposed-contraction dot."""
    t = idx_ref.shape[-1]
    mc = idx_ref.shape[0]
    shape = (zy, mc) if transposed else (mc, zy)
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if transposed else 1)
    a = None
    for k in range(t):
        ik = idx_ref[:, k][None, :] if transposed else idx_ref[:, k][:, None]
        hit = (iota == ik)
        if wt_ref is None:
            term = hit.astype(dt)
        else:
            # accumulate duplicate taps (clipped edges) in f32 and round
            # once — matches the XLA _axis_weights sum-then-cast order
            wk = (wt_ref[:, k][None, :] if transposed
                  else wt_ref[:, k][:, None])
            term = jnp.where(hit, wk.astype(jnp.float32), 0.0)
        a = term if a is None else a + term
    return a if wt_ref is None else a.astype(dt)


def _contract_kernel(*refs, zy, has_wt):
    it = iter(refs)
    idx_ref = next(it)
    wt_ref = next(it) if has_wt else None
    d_ref, out_ref = next(it), next(it)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = _build_a(idx_ref[0, 0], wt_ref[0, 0] if has_wt else None, zy,
                 jnp.bfloat16, transposed=True)
    out_ref[:] += jax.lax.dot_general(
        a, d_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def plane_contract(idx, wt, d, zy, *, chunk=512, interpret=None):
    """sum_p onehot(idx[p]) * wt[p] (x) d[p] -> (B, ZY, N) f32.

    idx: (B, M, T) int32 flat zy ids (>= ZY rows contribute zero);
    wt: (B, M, T) weights or None (unit weights); d: (B, M, N) bf16.
    """
    b, m, t = idx.shape
    n = d.shape[-1]
    if m % chunk:
        pad = chunk - m % chunk
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)), constant_values=zy)
        if wt is not None:
            wt = jnp.pad(wt, ((0, 0), (0, pad), (0, 0)))
        d = jnp.pad(d, ((0, 0), (0, pad), (0, 0)))
        m += pad
    nc = m // chunk
    idx = idx.reshape(b, nc, chunk, t)
    d = d.reshape(b, nc, chunk, n)
    args = [idx]
    in_specs = [
        pl.BlockSpec((1, 1, chunk, t), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if wt is not None:
        wt = wt.reshape(b, nc, chunk, t).astype(jnp.float32)
        args.append(wt)
        in_specs.append(
            pl.BlockSpec((1, 1, chunk, t), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    args.append(d.astype(jnp.bfloat16))
    in_specs.append(
        pl.BlockSpec((1, 1, chunk, n), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    vma = getattr(jax.typeof(d), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((b, zy, n), jnp.float32, vma=vma)
    return pl.pallas_call(
        functools.partial(_contract_kernel, zy=zy, has_wt=wt is not None),
        grid=(b, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, zy, n), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(*args)


def _gather_kernel(idx_ref, wt_ref, g_ref, out_ref, *, zy):
    a = _build_a(idx_ref[0, 0], wt_ref[0, 0], zy, jnp.bfloat16)
    out_ref[0, 0] = jax.lax.dot_general(
        a, g_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def plane_gather(idx, wt, g, *, chunk=512, interpret=None):
    """out[p] = sum_zy onehot(idx[p]) * wt[p] @ g[zy] -> (B, M, N) f32.

    idx/wt: (B, M, T); g: (B, ZY, N). The grid block's index map is
    constant over the chunk axis, so it loads into VMEM once per b.
    """
    b, m, t = idx.shape
    zy, n = g.shape[-2:]
    morig = m
    if m % chunk:
        pad = chunk - m % chunk
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)), constant_values=zy)
        wt = jnp.pad(wt, ((0, 0), (0, pad), (0, 0)))
        m += pad
    nc = m // chunk
    idx = idx.reshape(b, nc, chunk, t)
    wt = wt.reshape(b, nc, chunk, t).astype(jnp.float32)
    vma = getattr(jax.typeof(g), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((b, nc, chunk, n), jnp.float32,
                                     vma=vma)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, zy=zy),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, t), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, t), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zy, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(idx, wt, g.astype(jnp.bfloat16))
    return out.reshape(b, m, n)[:, :morig]
