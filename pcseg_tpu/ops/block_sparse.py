"""Block-sparse submanifold 3D convolution — dense conv on occupied tiles.

North-star sparse path, round-2 design (VERDICT.md "block-sparse
submanifold conv"; concept: partition the R^3 grid into t^3 tiles and
convolve only occupied tiles — Graham et al. submanifold sparsity at
tile granularity, cf. PAPERS.md).

Why tiles on TPU: the classic per-site gather rulebook (ops/sparse.py
``subm_conv``) loses to a masked dense conv because per-row gathers of
C-wide feature rows serialize (31.6 vs 14.3 ms at R=64/C=64 —
BASELINE.md). At tile granularity each gathered row is a whole t^3 x C
feature block (16 KB at t=8/C=16 bf16, 64 KB at C=64), which DMAs at
full HBM bandwidth, and the conv itself is a dense VALID conv over
(n_tiles, t+2, t+2, t+2, C) — regular MXU work proportional to the
OCCUPIED volume, not R^3.

Static-shape, host-free formulation (same philosophy as ops/sparse.py):
- occupied tiles are extracted to a fixed ``max_tiles`` capacity per
  event with ``jnp.nonzero(size=...)``;
- a dense (T^3+1,) lookup maps tile id -> slot, so the "rulebook" for
  the 27 neighbor tiles is one vectorized gather;
- the halo exchange is: gather the 27 neighbor tile blocks, lay them
  out as a (3t)^3 supertile, slice the centered (t+2)^3 halo.
- Submanifold semantics: outputs are masked to the per-voxel active
  set, so stacked layers never grow the occupied set and values at
  active sites equal ``subm_conv_dense`` (ops/sparse.py) exactly.

Everything is per-event and vmapped over the batch. Reference
counterpart: none (the reference has no sparse path; this serves
BASELINE.json's "sparse submanifold" north-star component).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.voxel import VoxelGrid, voxel_indices


class BlockSparseVoxels(NamedTuple):
    tile_ijk: jax.Array   # (B, NT, 3) int32 tile coords in the T^3 tile grid
    feats: jax.Array      # (B, NT, t, t, t, C) tile feature blocks
    active: jax.Array     # (B, NT, t, t, t) bool per-voxel occupancy
    tile_mask: jax.Array  # (B, NT) bool — real tile vs capacity padding
    lookup: jax.Array     # (B, T^3+1) int32 tile id -> slot, -1 empty
    dropped: jax.Array    # (B,) int32 occupied tiles beyond capacity
    grid_size: int        # static R
    tile: int             # static t


def block_sparse_from_grid(
    grid: VoxelGrid, max_tiles: int, tile: int = 8
) -> BlockSparseVoxels:
    """Extract occupied t^3 tiles from a dense VoxelGrid (capacity-capped).

    A tile is occupied iff any of its voxels has points. Occupied tiles
    beyond ``max_tiles`` are dropped and their per-event count returned
    in ``.dropped`` — points in dropped tiles read zero logits, so
    callers must surface a nonzero count (pick capacity from the data's
    tile-occupancy distribution; LArTPC tracks at R=64/t=8 occupy
    ~10-25% of the 512 tiles).
    """
    b, r = grid.features.shape[0], grid.features.shape[1]
    c = grid.features.shape[-1]
    t = tile
    if r % t:
        raise ValueError(f"grid {r} not divisible by tile {t}")
    nt = r // t
    nt3 = nt * nt * nt

    # tile-blocked relayout: (B, T, t, T, t, T, t, C) -> (B, T^3, t^3, C)
    blocked = grid.features.reshape(b, nt, t, nt, t, nt, t, c)
    blocked = blocked.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    flat_feats = blocked.reshape(b, nt3, t, t, t, c)
    occ = (grid.counts > 0).reshape(b, nt, t, nt, t, nt, t)
    occ = occ.transpose(0, 1, 3, 5, 2, 4, 6)
    flat_occ = occ.reshape(b, nt3, t, t, t)
    tile_occ = flat_occ.reshape(b, nt3, -1).any(axis=-1)

    def one(occ_e, feats_e, act_e):
        occupied = jnp.sum(occ_e.astype(jnp.int32))
        (ids,) = jnp.nonzero(occ_e, size=max_tiles, fill_value=nt3)
        tmask = ids < nt3
        dropped = jnp.maximum(occupied - max_tiles, 0)
        safe = jnp.where(tmask, ids, 0)
        feats = jnp.where(tmask[:, None, None, None, None], feats_e[safe], 0.0)
        active = jnp.where(tmask[:, None, None, None], act_e[safe], False)
        i = safe // (nt * nt)
        j = (safe // nt) % nt
        k = safe % nt
        ijk = jnp.stack([i, j, k], axis=-1).astype(jnp.int32)
        lookup = (
            jnp.full((nt3 + 1,), -1, jnp.int32)
            .at[jnp.where(tmask, ids, nt3)]
            .set(jnp.arange(max_tiles, dtype=jnp.int32))
        )
        lookup = lookup.at[nt3].set(-1)
        return ijk, feats, active, tmask, lookup, dropped

    ijk, feats, active, tmask, lookup, dropped = jax.vmap(one)(
        tile_occ, flat_feats, flat_occ
    )
    return BlockSparseVoxels(ijk, feats, active, tmask, lookup, dropped, r, t)


def block_sparse_voxelize(
    points: jax.Array,
    mask: jax.Array,
    grid_size: int,
    max_tiles: int,
    tile: int = 8,
    impl: str = "auto",
    matmul_dtype=jnp.bfloat16,
):
    """Voxelize straight into the tile-blocked layout (no dense grid).

    The grid route (``ops/voxel.voxelize`` then
    ``block_sparse_from_grid``) pays ~3.7 ms/step of 8-dim transpose
    copies relayouting the dense R^3 grid into (NT^3, t^3) tiles (r5
    step profile: fusion.1/copy.3901/divide_bitcast). The voxelizers
    scatter/contract BY FLAT ID, so remapping the id to blocked order
    (tid * t^3 + intra) makes them emit the tile-major layout directly
    — the one-hot contraction kernel (``voxelize_contract``) and the
    scatter are bijection-agnostic, and every downstream reshape is
    contiguous. Masked points keep the R^3 sentinel (== NT^3 * t^3).

    Returns (BlockSparseVoxels, lo, scale); features carry the point
    feature columns 3: plus the constant-1 occupancy channel, exactly
    like the grid route (scatter-mean semantics preserved).
    """
    from pcseg_tpu.ops.voxel import (
        _voxelize_matmul_raw,
        _voxelize_scatter,
        resolve_voxelize_impl,
    )

    r, t = grid_size, tile
    if r % t:
        raise ValueError(f"grid {r} not divisible by tile {t}")
    nt = r // t
    nt3, t3 = nt * nt * nt, t * t * t

    coords = points[..., :3].astype(jnp.float32)
    feats = points[..., 3:].astype(jnp.float32)
    occ1 = jnp.ones(feats.shape[:-1] + (1,), feats.dtype)
    feats = jnp.concatenate([feats, occ1], axis=-1)
    feats = jnp.where(mask[..., None], feats, 0.0)
    c = feats.shape[-1]

    flat, lo, scale = voxel_indices(coords, mask, r)
    i, j, k = flat // (r * r), (flat // r) % r, flat % r
    tid = ((i // t) * nt + (j // t)) * nt + (k // t)
    intra = ((i % t) * t + (j % t)) * t + (k % t)
    blocked = jnp.where(flat >= r * r * r, r * r * r, tid * t3 + intra)

    impl = resolve_voxelize_impl(impl, r, c)
    if impl == "matmul":
        raw = _voxelize_matmul_raw(blocked, feats[..., :-1], r,
                                   matmul_dtype)
        sums = raw.reshape(raw.shape[0], r * r * r, c)
    else:
        sums, cnts = _voxelize_scatter(blocked, feats, r * r * r, c)
        sums = jnp.concatenate([sums[..., :-1], cnts[..., None]],
                               axis=-1)
    cnts = sums[..., -1]
    mean = sums[..., :-1] / jnp.maximum(cnts[..., None], 1.0)
    mean = jnp.concatenate(
        [mean, jnp.minimum(cnts[..., None], 1.0)], axis=-1
    )                                        # occupancy channel back
    b = points.shape[0]
    bf = mean.reshape(b, nt3, t, t, t, c)
    act = (cnts > 0).reshape(b, nt3, t, t, t)
    tile_occ = act.reshape(b, nt3, -1).any(axis=-1)

    def one(occ_e, feats_e, act_e):
        occupied = jnp.sum(occ_e.astype(jnp.int32))
        (ids,) = jnp.nonzero(occ_e, size=max_tiles, fill_value=nt3)
        tmask = ids < nt3
        dropped = jnp.maximum(occupied - max_tiles, 0)
        safe = jnp.where(tmask, ids, 0)
        f = jnp.where(tmask[:, None, None, None, None], feats_e[safe],
                      0.0)
        a = jnp.where(tmask[:, None, None, None], act_e[safe], False)
        ti = safe // (nt * nt)
        tj = (safe // nt) % nt
        tk = safe % nt
        ijk = jnp.stack([ti, tj, tk], axis=-1).astype(jnp.int32)
        lookup = (
            jnp.full((nt3 + 1,), -1, jnp.int32)
            .at[jnp.where(tmask, ids, nt3)]
            .set(jnp.arange(max_tiles, dtype=jnp.int32))
        )
        lookup = lookup.at[nt3].set(-1)
        return ijk, f, a, tmask, lookup, dropped

    ijk, f, a, tmask, lookup, dropped = jax.vmap(one)(tile_occ, bf, act)
    return (BlockSparseVoxels(ijk, f, a, tmask, lookup, dropped, r, t),
            lo, scale)


def _tile_deltas() -> jnp.ndarray:
    return jnp.asarray(
        [[dz, dy, dx]
         for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        jnp.int32,
    )


def _neighbor_slots(bs: BlockSparseVoxels, sign: int) -> jax.Array:
    """(B, NT, 27) neighbor slot per tile: slot of the tile at
    ``pos + sign * delta`` (-1 when out of grid / unoccupied / this row
    is capacity padding)."""
    nt = bs.grid_size // bs.tile
    nt3 = nt * nt * nt
    deltas = sign * _tile_deltas()

    def one(ijk, lookup, tmask):
        nijk = ijk[:, None, :] + deltas[None, :, :]      # (NT, 27, 3)
        inb = jnp.all((nijk >= 0) & (nijk < nt), axis=-1) & tmask[:, None]
        nflat = (nijk[..., 0] * nt + nijk[..., 1]) * nt + nijk[..., 2]
        return lookup[jnp.where(inb, nflat, nt3)]        # (NT, 27)

    return jax.vmap(one)(bs.tile_ijk, bs.lookup, bs.tile_mask)


def _provider_slice(t: int, d: int) -> slice:
    """The sub-block of the PROVIDER tile a delta-d reader needs."""
    return {-1: slice(t - 1, t), 0: slice(None), 1: slice(0, 1)}[d]


def _gather_halo_slots(feats: jax.Array, slot: jax.Array, t: int,
                       impl: str | None = None):
    """(B, NT, t+2, t+2, t+2, C) halo blocks from the 27-neighbor table.

    feats: (B, NT, t, t, t, C) current layer features; slot: (B, NT, 27)
    neighbor slot table from ``_neighbor_slots(bs, +1)``. Capacity
    padding and out-of-grid neighbors read the all-zero sentinel row.

    Each of the 26 neighbor deltas reads only the sub-block the halo
    actually needs (face t^2, edge t, corner 1 voxel columns) from a
    pre-sliced table, and the center block is the tile itself (no
    gather) — assembling full 3^3 neighbor supertiles first was 13.8x
    the halo volume in HBM traffic (measured 17.7 ms vs 6.9 dense at
    R=64/C=64; this form moves ~halo-sized data only).

    impl: "onehot" (TPU default) contracts each delta's provider table
    with a (NT, NT+1) one-hot selection matrix on the MXU; "gather"
    (CPU default) row-gathers. None picks by backend. The one-hot form
    exists because XLA lowers the gather form to 26 strided slice-gather
    kernels measured at ~55 GB/s (1.49 ms each at B8/NT64/C64 — they
    dominated the r4 45 ms step at ~23 ms), while the same selection as
    a matmul runs at full MXU/HBM rate; selection rows have exactly one
    unit entry, so values are EXACT in the feats dtype (bf16 products of
    1.0 round-trip exactly, f32 accumulation). Its autodiff transpose is
    the TRANSPOSED one-hot matmul — the backward scatter-add becomes MXU
    work for free, where the r4 hand-written gather-adjoint custom VJP
    lost 20 ms to defusing the assembly from its consumers (that
    negative result held for the GATHER form; matmuls don't fuse into
    consumers anyway, so the boundary costs nothing here).
    """
    if impl is None:
        from pcseg_tpu.core.portable import tpu_kernels_enabled

        impl = "onehot" if tpu_kernels_enabled() else "gather"
    nt = feats.shape[1]

    def one(f, s):
        fpad = jnp.concatenate([jnp.zeros_like(f[:1]), f], axis=0)
        if impl == "onehot":
            cols = jax.lax.broadcasted_iota(jnp.int32, (nt, nt + 1), 1)
            onehots = [
                jnp.where(cols == (s[:, d] + 1)[:, None], 1.0, 0.0)
                .astype(f.dtype)
                for d in range(27)
            ]
        parts_z = []
        for iz, dz in enumerate((-1, 0, 1)):
            parts_y = []
            for iy, dy in enumerate((-1, 0, 1)):
                parts_x = []
                for ix, dx in enumerate((-1, 0, 1)):
                    if dz == dy == dx == 0:
                        parts_x.append(f)
                        continue
                    d_idx = iz * 9 + iy * 3 + ix
                    src = fpad[:, _provider_slice(t, dz), :, :][
                        :, :, _provider_slice(t, dy)
                    ][:, :, :, _provider_slice(t, dx)]
                    if impl == "onehot":
                        g = jax.lax.dot_general(
                            onehots[d_idx],
                            src.reshape(nt + 1, -1),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        parts_x.append(
                            g.astype(f.dtype).reshape((nt,) + src.shape[1:])
                        )
                    else:
                        parts_x.append(src[s[:, d_idx] + 1])
                parts_y.append(jnp.concatenate(parts_x, axis=3))
            parts_z.append(jnp.concatenate(parts_y, axis=2))
        return jnp.concatenate(parts_z, axis=1)

    return jax.vmap(one)(feats, slot)


def _gather_halo(bs: BlockSparseVoxels, feats: jax.Array) -> jax.Array:
    """See _gather_halo_slots; this wrapper builds the slot table."""
    return _gather_halo_slots(feats, _neighbor_slots(bs, +1), bs.tile)


def block_subm_conv(
    p: dict,
    bs: BlockSparseVoxels,
    feats: jax.Array | None = None,
    compute_dtype=None,
    raw: bool = False,
) -> jax.Array:
    """Submanifold 3^3 conv on occupied tiles: (B, NT, t,t,t, Cin) ->
    (B, NT, t,t,t, Cout), masked to the active voxel set.

    Same parameter pytree as ``subm_conv_init`` (kernel (27, Cin, Cout) +
    bias) so the three sparse impls share weights; values at active sites
    match ``subm_conv_dense`` (tested).

    ``raw=True`` returns the bare conv output in the compute dtype —
    no f32 upcast, no bias, no active-mask select. The fused-LN model
    path folds all three into the LN kernel (ops/pallas/fused_ln.py
    ``bias_ln_relu_mask``): the conv output is bf16 before its upcast
    anyway, so values are unchanged while the (N, C) f32 intermediate
    and its separate bias+select pass disappear (~2.6 ms/step of
    add_select fusions in the r5 xplane profile).
    """
    if feats is None:
        feats = bs.feats
    dt = compute_dtype or feats.dtype
    b, ntiles, t = feats.shape[0], feats.shape[1], bs.tile
    k3, cin, cout = p["kernel"].shape
    k = round(k3 ** (1 / 3))
    if k != 3:
        raise ValueError("block_subm_conv supports 3^3 kernels")
    halo = _gather_halo(bs, feats)                       # (B, NT, t+2,^3, Cin)
    kern = p["kernel"].reshape(k, k, k, cin, cout)
    # no explicit f32 output type: mixed-dtype cotangents break the conv
    # transpose under autodiff (same constraint as ops/conv3d.py); the
    # MXU accumulates in f32 regardless
    y = jax.lax.conv_general_dilated(
        halo.reshape(b * ntiles, t + 2, t + 2, t + 2, cin).astype(dt),
        kern.astype(dt),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).reshape(b, ntiles, t, t, t, cout)
    if raw:
        return y
    y = y.astype(jnp.float32) + p["bias"]
    return jnp.where(bs.active[..., None], y, 0.0)


def _point_cells(bs: BlockSparseVoxels, points, mask):
    """Per-point (tile slot, intra-voxel id): (B, M) int32 each. The
    slot is the capacity sentinel NT for masked / out-of-grid /
    dropped-tile points (their readout is zero)."""
    t = bs.tile
    r = bs.grid_size
    nt = r // t
    nt3 = nt * nt * nt
    flat, _, _ = voxel_indices(points[..., :3], mask, r)
    i, j, k = flat // (r * r), (flat // r) % r, flat % r
    tid = ((i // t) * nt + (j // t)) * nt + (k // t)
    tid = jnp.where(flat >= r * r * r, nt3, tid)
    slot = jax.vmap(lambda lu, te: lu[te])(bs.lookup, tid)   # -1 if no tile
    ntiles = bs.tile_ijk.shape[1]
    slot = jnp.where(slot >= 0, slot, ntiles)
    intra = ((i % t) * t + (j % t)) * t + (k % t)
    return slot.astype(jnp.int32), intra.astype(jnp.int32)


def _readout_raw(site_flat, slot, intra):
    """site_flat (B, NT, t^3, C), slot/intra (B, M) -> (B, M, C);
    sentinel slot NT reads zeros."""
    def one(vals, s, i):
        vpad = jnp.concatenate([vals, jnp.zeros_like(vals[:1])], axis=0)
        return vpad[s, i]

    return jax.vmap(one)(site_flat, slot, intra)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _readout(site_flat, slot, intra):
    return _readout_raw(site_flat, slot, intra)


def _readout_fwd(site_flat, slot, intra):
    # dtype exemplar, not site_flat.dtype itself: residuals are traced
    # pytrees and a raw np.dtype is not a valid JAX type
    return _readout_raw(site_flat, slot, intra), (
        slot, intra, site_flat.shape,
        jnp.zeros((0,), site_flat.dtype),
    )


def _readout_bwd(res, g):
    import numpy as np

    from pcseg_tpu.ops.pallas.onehot_contract import rowcol_scatter

    slot, intra, shape, dtype_ex = res
    b, ntiles, t3, c = shape
    # XLA transposes the readout gather into a per-point scatter-add
    # that serializes on TPU (~1.1 ms at B8 x 8192); as a (slot, intra)
    # one-hot MXU contraction it is regular matmul work. bf16 operand
    # rounding of the cotangents, f32 accumulation — the same precision
    # convention as the devoxelize backward (ops/voxel.py bwd_dtype).
    # The cotangent must carry site_flat's own dtype (f32 accumulation
    # stays inside the kernel; cast only the aval-facing result).
    dv = rowcol_scatter(slot, intra, g, ntiles, t3)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (dv.reshape(b, ntiles, t3, c).astype(dtype_ex.dtype),
            f0(slot), f0(intra))


_readout.defvjp(_readout_fwd, _readout_bwd)


def block_gather_point_logits(
    site_values: jax.Array,
    bs: BlockSparseVoxels,
    points: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Per-point readout from tile blocks (sparse devoxelize, nearest):
    each point reads its voxel's value; points in dropped/unoccupied
    tiles get zeros. On TPU the backward runs as a one-hot MXU
    contraction (``rowcol_scatter``) instead of XLA's serializing
    per-point scatter-add; CPU keeps the autodiff transpose (the Pallas
    interpreter can't evaluate vma-typed operands)."""
    t = bs.tile
    slot, intra = _point_cells(bs, points, mask)
    b, ntiles = site_values.shape[:2]
    site_flat = site_values.reshape(b, ntiles, t * t * t, -1)
    from pcseg_tpu.core.portable import tpu_kernels_enabled

    read = _readout if tpu_kernels_enabled() else _readout_raw
    out = read(site_flat, slot, intra)
    return jnp.where(mask[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# tile hierarchy: strided down / transposed up between resolutions
# ---------------------------------------------------------------------------
#
# A sparse U-Net needs pooled occupancy hierarchies. Tiles keep their edge
# t across levels; a coarse tile's 2t-cube footprint covers exactly its 8
# fine child tiles, so the k=2/s=2 (transposed-)convs need NO halo: down
# assembles the 8 children and runs one dense VALID conv; up gathers the
# parent's octant sub-block and expands it with the flipped taps. Same
# parameter pytrees as ops/conv3d.py's strided convs (the dense impl),
# so the two sparse hierarchies share weights and can be parity-tested.

def block_pool(
    bs: BlockSparseVoxels, max_tiles: int
) -> tuple[BlockSparseVoxels, jax.Array]:
    """Coarse-level tile skeleton (grid R/2, same t) + child slot table.

    Returns (bs_coarse, child_slots (B, NTc, 8)): a coarse tile is
    occupied iff any of its 8 children is; its ``active`` mask is the
    2^3-pooled fine active mask; ``feats`` is a zero-channel placeholder
    (layer features are threaded explicitly through the conv helpers).
    """
    t = bs.tile
    nt = bs.grid_size // t
    if nt % 2:
        raise ValueError(
            f"block_pool needs an even tile grid (R/t = {nt}); edge tiles "
            f"would be dropped otherwise"
        )
    ntc = nt // 2
    ntc3 = ntc * ntc * ntc
    b, nfine = bs.tile_ijk.shape[:2]

    def one(ijk, tmask, lookup_f, active_f):
        pflat = ((ijk[:, 0] // 2) * ntc + ijk[:, 1] // 2) * ntc + ijk[:, 2] // 2
        pflat = jnp.where(tmask, pflat, ntc3)
        occ = jnp.zeros((ntc3 + 1,), bool).at[pflat].set(True)[:ntc3]
        occupied = jnp.sum(occ.astype(jnp.int32))
        (ids,) = jnp.nonzero(occ, size=max_tiles, fill_value=ntc3)
        cmask = ids < ntc3
        dropped = jnp.maximum(occupied - max_tiles, 0)
        safe = jnp.where(cmask, ids, 0)
        ci = safe // (ntc * ntc)
        cj = (safe // ntc) % ntc
        ck = safe % ntc
        cijk = jnp.stack([ci, cj, ck], axis=-1).astype(jnp.int32)
        clookup = (
            jnp.full((ntc3 + 1,), -1, jnp.int32)
            .at[jnp.where(cmask, ids, ntc3)]
            .set(jnp.arange(max_tiles, dtype=jnp.int32))
        )
        clookup = clookup.at[ntc3].set(-1)
        # child fine-tile slots per coarse tile: (NTc, 8)
        deltas = jnp.asarray(
            [[dz, dy, dx] for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
            jnp.int32,
        )
        cf = 2 * cijk[:, None, :] + deltas[None, :, :]
        cflat = (cf[..., 0] * nt + cf[..., 1]) * nt + cf[..., 2]
        cflat = jnp.where(cmask[:, None], cflat, nt * nt * nt)
        slots = lookup_f[cflat]                       # (NTc, 8), -1 empty
        # pooled active: assemble children actives, 2^3 max-pool
        apad = jnp.concatenate(
            [jnp.zeros_like(active_f[:1]), active_f], axis=0
        )
        ch = apad[slots + 1]                          # (NTc, 8, t, t, t)
        asm = ch.reshape(-1, 2, 2, 2, t, t, t).transpose(0, 1, 4, 2, 5, 3, 6)
        asm = asm.reshape(-1, 2 * t, 2 * t, 2 * t)
        cact = asm.reshape(-1, t, 2, t, 2, t, 2).any(axis=(2, 4, 6))
        return cijk, cact, cmask, clookup, slots, dropped

    cijk, cact, cmask, clookup, slots, dropped = jax.vmap(one)(
        bs.tile_ijk, bs.tile_mask, bs.lookup, bs.active
    )
    feats0 = jnp.zeros(cact.shape + (0,), jnp.float32)
    bsc = BlockSparseVoxels(
        cijk, feats0, cact, cmask, clookup, dropped, bs.grid_size // 2, t
    )
    return bsc, slots


# -- octant pack / unpack: the two child<->parent data movements of the
# tile hierarchy, as mutually-adjoint custom-VJP gathers. Their autodiff
# transposes are row scatter-adds (serialize on TPU — dominated the r4
# block-U-Net profile); since each real fine tile maps to exactly one
# (parent, octant), the adjoint of each is the OTHER's gather.

def _parent_rows(bs_coarse: BlockSparseVoxels, bs_fine: BlockSparseVoxels):
    """(B, NTf) parent slot (-1 when dropped/padding) and (B, NTf)
    octant index of each fine tile within its parent."""
    ntcg = bs_coarse.grid_size // bs_coarse.tile
    ntc3 = ntcg * ntcg * ntcg

    def one(ijk_f, fmask, lookup_c):
        pflat = (
            (ijk_f[:, 0] // 2) * ntcg + ijk_f[:, 1] // 2
        ) * ntcg + ijk_f[:, 2] // 2
        pflat = jnp.where(fmask, pflat, ntc3)
        pslot = lookup_c[pflat]
        octant = (
            (ijk_f[:, 0] % 2) * 4 + (ijk_f[:, 1] % 2) * 2 + ijk_f[:, 2] % 2
        )
        return pslot, octant

    return jax.vmap(one)(
        bs_fine.tile_ijk, bs_fine.tile_mask, bs_coarse.lookup
    )


def _octant_pack_raw(ych, child_slots, th):
    """(B, NTf, th,th,th, C) + (B, NTc, 8) -> (B, NTc, 2th,^3, C):
    assemble each parent's 8 octants from its children (zeros where a
    child is absent)."""
    ntc = child_slots.shape[1]
    c = ych.shape[-1]

    def one(y, slots):
        ch = _row_gather_flat(y, slots.reshape(-1)).reshape(
            ntc, 2, 2, 2, th, th, th, c
        )
        asm = ch.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return asm.reshape(ntc, 2 * th, 2 * th, 2 * th, c)

    return jax.vmap(one)(ych, child_slots)


def _octant_unpack_raw(cf, pslot, octant, th):
    """(B, NTc, 2th,^3, C) + (B, NTf) x2 -> (B, NTf, th,th,th, C): each
    fine tile reads its parent's octant sub-block (zeros when absent)."""
    c = cf.shape[-1]

    def one(x, ps, oc):
        ntc = x.shape[0]
        oct_ = x.reshape(ntc, 2, th, 2, th, 2, th, c)
        oct_ = oct_.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        oct_ = oct_.reshape(ntc * 8, th, th, th, c)
        row = jnp.where(ps >= 0, ps * 8 + oc, -1)
        return _row_gather_flat(oct_, row)

    return jax.vmap(one)(cf, pslot, octant)


def _row_gather_flat(x, rows):
    """Sentinel-padded row gather on a single event: x (N, ...),
    rows (M,) with -1 reading zeros."""
    xpad = jnp.concatenate([jnp.zeros_like(x[:1]), x], axis=0)
    return xpad[rows + 1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _octant_pack(ych, child_slots, pslot, octant, th):
    return _octant_pack_raw(ych, child_slots, th)


def _octant_pack_fwd(ych, child_slots, pslot, octant, th):
    return _octant_pack_raw(ych, child_slots, th), (child_slots, pslot,
                                                    octant)


def _octant_pack_bwd(th, res, g):
    import numpy as np

    child_slots, pslot, octant = res
    dy = _octant_unpack_raw(g, pslot, octant, th)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return dy, f0(child_slots), f0(pslot), f0(octant)


_octant_pack.defvjp(_octant_pack_fwd, _octant_pack_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _octant_unpack(cf, pslot, octant, child_slots, th):
    return _octant_unpack_raw(cf, pslot, octant, th)


def _octant_unpack_fwd(cf, pslot, octant, child_slots, th):
    return _octant_unpack_raw(cf, pslot, octant, th), (pslot, octant,
                                                       child_slots)


def _octant_unpack_bwd(th, res, g):
    import numpy as np

    pslot, octant, child_slots = res
    dc = _octant_pack_raw(g, child_slots, th)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return dc, f0(pslot), f0(octant), f0(child_slots)


_octant_unpack.defvjp(_octant_unpack_fwd, _octant_unpack_bwd)


def block_down2x(
    p: dict,
    feats: jax.Array,
    bs_coarse: BlockSparseVoxels,
    child_slots: jax.Array,
    compute_dtype=None,
    bs_fine: BlockSparseVoxels | None = None,
    raw: bool = False,
) -> jax.Array:
    """Stride-2 k=2 conv fine tiles -> coarse tiles.

    feats: (B, NTf, t, t, t, Cin) fine features; p["kernel"]
    (2, 2, 2, Cin, Cout) — same params as ops/conv3d.py conv3d(stride=2).
    Returns (B, NTc, t, t, t, Cout) masked to the pooled active set.

    r4 formulation: the k=2/s=2 windows never cross child-tile
    boundaries (children are t-aligned, t even), so the conv runs on the
    FINE tiles (occupied only) and each parent's (t/2)^3 octants are
    assembled afterwards — 1/8 the conv FLOPs and HBM traffic of
    assembling dense (2t)^3 supertiles first (which moved 268 MB/step at
    the r4 bench config and cost a serializing scatter in the backward).
    Pass ``bs_fine`` to enable the gather-adjoint backward (_octant_pack);
    without it the assembly gather falls back to the autodiff scatter.
    """
    dt = compute_dtype or feats.dtype
    t = bs_coarse.tile
    th = t // 2
    b, ntf = feats.shape[:2]
    cin = feats.shape[-1]
    cout = p["kernel"].shape[-1]

    y = jax.lax.conv_general_dilated(
        feats.reshape(b * ntf, t, t, t, cin).astype(dt),
        p["kernel"].astype(dt),
        window_strides=(2, 2, 2),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).reshape(b, ntf, th, th, th, cout)
    if bs_fine is not None:
        pslot, octant = _parent_rows(bs_coarse, bs_fine)
        asm = _octant_pack(y, child_slots, pslot, octant, th)
    else:
        asm = _octant_pack_raw(y, child_slots, th)
    if raw:
        # bias/mask fold into the fused-LN kernel (see block_subm_conv)
        return asm
    out = asm.astype(jnp.float32) + p["bias"]
    return jnp.where(bs_coarse.active[..., None], out, 0.0)


def block_up2x(
    p: dict,
    cfeats: jax.Array,
    bs_coarse: BlockSparseVoxels,
    bs_fine: BlockSparseVoxels,
    compute_dtype=None,
    child_slots: jax.Array | None = None,
    raw: bool = False,
) -> jax.Array:
    """Stride-2 k=2 TRANSPOSED conv coarse tiles -> fine tiles.

    cfeats: (B, NTc, t, t, t, Cin); p["kernel"] (2, 2, 2, Cin, Cout) —
    same params as ops/conv3d.py conv3d_transpose (which places
    x[i'] @ w[1-dz,1-dy,1-dx] at output 2i'+dz). Each fine tile reads its
    parent's octant sub-block via ``_octant_unpack`` (one row gather from
    an octant-split table; with ``child_slots`` the backward is the
    adjoint _octant_pack GATHER instead of a serializing scatter-add).
    Returns (B, NTf, t, t, t, Cout) masked to the fine active set.
    Requires even t.
    """
    dt = compute_dtype or cfeats.dtype
    t = bs_fine.tile
    th = t // 2
    cout = p["kernel"].shape[-1]
    wflip = jnp.flip(p["kernel"], axis=(0, 1, 2))     # (2,2,2,Cin,Cout)

    pslot, octant = _parent_rows(bs_coarse, bs_fine)
    if child_slots is not None:
        sub = _octant_unpack(cfeats, pslot, octant, child_slots, th)
    else:
        sub = _octant_unpack_raw(cfeats, pslot, octant, th)

    # expand: fine[2a+dz, 2b+dy, 2c+dx] = sub[a,b,c] @ wflip[dz,dy,dx]
    y = jnp.einsum(
        "Bnabci,zyxio->Bnazbycxo",
        sub.astype(dt), wflip.astype(dt),
        preferred_element_type=jnp.float32,
    )
    y = y.reshape(sub.shape[0], sub.shape[1], t, t, t, cout)
    if raw:
        # bias/mask fold into the fused-LN kernel (see block_subm_conv);
        # one extra bf16 rounding of the f32 einsum accumulator vs the
        # non-raw path (the package-wide compute-dtype convention)
        return y.astype(dt)
    y = y.astype(jnp.float32) + p["bias"]
    return jnp.where(bs_fine.active[..., None], y, 0.0)
