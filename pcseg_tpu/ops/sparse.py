"""Submanifold sparse 3D convolution on occupied voxels.

North-star component (BASELINE.json: "sparse submanifold path that only
convolves occupied voxels via gather-scatter rulebooks"); concept follows
Graham et al., 3D Semantic Segmentation with Submanifold Sparse
Convolutional Networks (PAPERS.md).

TPU-first formulation — static shapes, no host-side rulebook build:
- Active sites are extracted to a fixed capacity ``max_active`` per event
  (``jnp.nonzero(size=...)``), padded with a sentinel.
- A dense ``lookup`` table (R^3+1,) maps flat voxel id -> site index
  (or -1), built with one scatter. This replaces the CPU hash-map
  rulebook: the "rulebook" for kernel offset k is simply
  ``lookup[flat(site_ijk + delta_k)]`` — a vectorized gather.
- The convolution is gather-then-matmul per offset: output sites equal
  input sites (submanifold), so NO scatter is needed — each site sums
  ``W_k @ x[neighbor_k]`` over the K=27 offsets. The 27 gathered feature
  blocks form one (K*A, Cin) x (Cin, Cout) batched matmul family that
  tiles straight onto the MXU.

Everything is per-event and vmapped over the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.voxel import VoxelGrid, voxel_indices


class SparseVoxels(NamedTuple):
    ijk: jax.Array        # (B, A, 3) int32 voxel coords of active sites
    feats: jax.Array      # (B, A, C) site features
    site_mask: jax.Array  # (B, A) bool — real site vs capacity padding
    lookup: jax.Array     # (B, R^3+1) int32 flat-id -> site index, -1 empty
    dropped: jax.Array    # (B,) int32 occupied sites beyond capacity
    grid_size: int        # static


def sparse_from_grid(grid: VoxelGrid, max_active: int) -> SparseVoxels:
    """Extract occupied voxels from a dense VoxelGrid (capacity-capped).

    Occupied sites beyond ``max_active`` are dropped; the per-event count
    of dropped sites is returned in ``.dropped`` so callers can surface
    capacity exhaustion (points in dropped voxels get zero logits —
    silent truncation would be an invisible accuracy loss).
    """
    r = grid.features.shape[1]
    r3 = r * r * r
    b = grid.features.shape[0]
    flat_feats = grid.features.reshape(b, r3, -1)
    flat_cnt = grid.counts.reshape(b, r3)

    def one(cnt_e, feats_e):
        occupied = jnp.sum((cnt_e > 0).astype(jnp.int32))
        (flat_ids,) = jnp.nonzero(cnt_e > 0, size=max_active, fill_value=r3)
        site_mask = flat_ids < r3
        dropped = jnp.maximum(occupied - max_active, 0)
        safe = jnp.where(site_mask, flat_ids, 0)
        feats = jnp.where(site_mask[:, None], feats_e[safe], 0.0)
        i = safe // (r * r)
        j = (safe // r) % r
        k = safe % r
        ijk = jnp.stack([i, j, k], axis=-1).astype(jnp.int32)
        lookup = (
            jnp.full((r3 + 1,), -1, jnp.int32)
            .at[jnp.where(site_mask, flat_ids, r3)]
            .set(jnp.arange(max_active, dtype=jnp.int32))
        )
        # sentinel slot must stay -1 (capacity padding writes land there)
        lookup = lookup.at[r3].set(-1)
        return ijk, feats, site_mask, lookup, dropped

    ijk, feats, site_mask, lookup, dropped = jax.vmap(one)(
        flat_cnt, flat_feats
    )
    return SparseVoxels(ijk, feats, site_mask, lookup, dropped, r)


def _offsets(kernel: int = 3) -> jnp.ndarray:
    """(K^3, 3) int32 neighbor deltas, center included."""
    rng = range(-(kernel // 2), kernel // 2 + 1)
    return jnp.asarray(
        [[dx, dy, dz] for dx in rng for dy in rng for dz in rng], jnp.int32
    )


def subm_conv_init(key: jax.Array, cin: int, cout: int, kernel: int = 3) -> dict:
    k3 = kernel ** 3
    fan_in = k3 * cin
    bound = jnp.sqrt(6.0 / fan_in)
    return {
        "kernel": jax.random.uniform(
            key, (k3, cin, cout), jnp.float32, -bound, bound
        ),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def subm_conv(
    p: dict, sp: SparseVoxels, kernel: int = 3, compute_dtype=None
) -> jax.Array:
    """Submanifold conv: (B, A, Cin) -> (B, A, Cout) on the same sites."""
    deltas = _offsets(kernel)                      # (K, 3)
    r = sp.grid_size
    r3 = r * r * r
    dt = compute_dtype or sp.feats.dtype

    def one(ijk, feats, site_mask, lookup):
        # neighbor flat ids for every (site, offset): (K, A)
        nijk = ijk[None, :, :] + deltas[:, None, :]
        inb = jnp.all((nijk >= 0) & (nijk < r), axis=-1) & site_mask[None, :]
        nflat = (nijk[..., 0] * r + nijk[..., 1]) * r + nijk[..., 2]
        nflat = jnp.where(inb, nflat, r3)
        nsite = lookup[nflat]                      # (K, A), -1 if empty
        exists = nsite >= 0
        gathered = feats[jnp.maximum(nsite, 0)]    # (K, A, Cin)
        gathered = jnp.where(exists[..., None], gathered, 0.0)
        # (K, A, Cin) x (K, Cin, Cout) -> sum_K (A, Cout): one batched
        # MXU contraction
        y = jax.lax.dot_general(
            gathered.astype(dt),
            p["kernel"].astype(dt),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (K, A, Cout)
        return jnp.sum(y, axis=0) + p["bias"]

    out = jax.vmap(one)(sp.ijk, sp.feats, sp.site_mask, sp.lookup)
    return jnp.where(sp.site_mask[..., None], out, 0.0)


def subm_conv_dense(
    p: dict, grid_feats: jax.Array, active: jax.Array, compute_dtype=None
) -> jax.Array:
    """Submanifold conv via masked DENSE conv3d.

    grid_feats: (B, R, R, R, C) with zeros at empty voxels; active:
    (B, R, R, R) bool occupancy. Outputs are masked back to the active
    set, so stacked layers never grow the occupied set — identical values
    at active sites to the gather formulation (``subm_conv``).

    Why it exists: on TPU, per-row gathers serialize — measured 29.9 ms
    for the 27-offset gather at A=8192 sites vs 7.0 ms for the whole
    dense conv at R=64 (BASELINE.md). Random access loses to dense MXU
    work at LArTPC-like occupancies; the gather path remains for
    accelerators/occupancies where it wins. The block-sparse impl
    (ops/block_sparse.py) beats both at low occupancy (2.7 ms).
    """
    dt = compute_dtype or grid_feats.dtype
    k3, cin, cout = p["kernel"].shape
    k = round(k3 ** (1 / 3))
    kern = p["kernel"].reshape(k, k, k, cin, cout)
    # no explicit f32 output type: mixed-dtype cotangents break the conv
    # transpose under autodiff (same constraint as ops/conv3d.py)
    y = jax.lax.conv_general_dilated(
        grid_feats.astype(dt),
        kern.astype(dt),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(jnp.float32) + p["bias"]
    return jnp.where(active[..., None], y, 0.0)


def sparse_pool(sp: SparseVoxels, max_active: int) -> SparseVoxels:
    """Stride-2 occupancy pooling: coarse site active iff any of its 2^3
    children is an (in-capacity) active fine site.

    Mirrors the dense impl's ``reduce_window(or)`` over the occupancy grid
    (models/sparse_unet.py _apply_dense) so the gather U-Net sees the same
    pooled hierarchy. Returns a coarse SparseVoxels at R/2 with zero-width
    features (the level's features come from ``sparse_down2x``); its
    ``.dropped`` counts coarse sites beyond capacity, which callers must
    surface like every other capacity cap."""
    r = sp.grid_size
    rc = r // 2
    b = sp.lookup.shape[0]
    occ = (sp.lookup[:, : r * r * r] >= 0).reshape(b, rc, 2, rc, 2, rc, 2)
    cnt = jnp.any(occ, axis=(2, 4, 6)).astype(jnp.int32)
    grid = VoxelGrid(
        features=jnp.zeros((b, rc, rc, rc, 0), sp.feats.dtype),
        counts=cnt,
        lo=jnp.zeros((b, 3), jnp.float32),
        scale=jnp.ones((b, 3), jnp.float32),
    )
    return sparse_from_grid(grid, max_active)


def _taps2() -> jnp.ndarray:
    """(8, 3) int32 within-parent offsets, ordered as a (2,2,2) reshape."""
    return jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )


def sparse_down2x(
    p: dict,
    x_fine: jax.Array,
    sp_fine: SparseVoxels,
    sp_coarse: SparseVoxels,
    compute_dtype=None,
) -> jax.Array:
    """Stride-2 down conv on sites: (B, Af, Cin) -> (B, Ac, Cout).

    Per coarse site o: sum_t W[t] @ x[2o + t] over the 2^3 children
    (absent children contribute zero) — numerically identical at active
    sites to the dense impl's ``conv3d(stride=2)`` masked to the pooled
    occupancy (tap mapping verified against lax.conv_general_dilated).
    p["kernel"]: (2, 2, 2, Cin, Cout) as from conv3d_init."""
    rf = sp_fine.grid_size
    rf3 = rf * rf * rf
    dt = compute_dtype or x_fine.dtype
    kern = p["kernel"].reshape(8, *p["kernel"].shape[-2:])   # (8, Cin, Cout)
    taps = _taps2()

    def one(ijk_c, mask_c, lookup_f, xf):
        child = ijk_c[None, :, :] * 2 + taps[:, None, :]     # (8, Ac, 3)
        cflat = (child[..., 0] * rf + child[..., 1]) * rf + child[..., 2]
        cflat = jnp.where(mask_c[None, :], cflat, rf3)
        csite = lookup_f[cflat]                              # (8, Ac)
        exists = csite >= 0
        g = xf[jnp.maximum(csite, 0)]                        # (8, Ac, Cin)
        g = jnp.where(exists[..., None], g, 0.0)
        y = jax.lax.dot_general(
            g.astype(dt),
            kern.astype(dt),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                    # (8, Ac, Cout)
        return jnp.sum(y, axis=0) + p["bias"]

    out = jax.vmap(one)(
        sp_coarse.ijk, sp_coarse.site_mask, sp_fine.lookup, x_fine
    )
    return jnp.where(sp_coarse.site_mask[..., None], out, 0.0)


def sparse_up2x(
    p: dict,
    h_coarse: jax.Array,
    sp_coarse: SparseVoxels,
    sp_fine: SparseVoxels,
    compute_dtype=None,
) -> jax.Array:
    """Stride-2 transposed conv on sites: (B, Ac, Cin) -> (B, Af, Cout).

    Each fine site f = 2p + t reads W[1 - t] @ h[parent p] — the tap
    mapping of ``lax.conv_transpose(k=2, s=2, SAME)`` (verified
    numerically; conv_transpose does not flip the kernel, the 1-t comes
    from its input-dilated formulation). The per-site tap select runs as
    8 masked matmuls (one per tap) rather than a per-row kernel gather —
    gathers of (Cin, Cout) blocks serialize on TPU, masked MXU work
    doesn't. p["kernel"]: (2, 2, 2, Cin, Cout)."""
    rc = sp_coarse.grid_size
    rc3 = rc * rc * rc
    dt = compute_dtype or h_coarse.dtype
    kern = p["kernel"].reshape(8, *p["kernel"].shape[-2:])   # (8, Cin, Cout)

    def one(ijk_f, mask_f, lookup_c, hc):
        parent = ijk_f // 2                                  # (Af, 3)
        pflat = (parent[..., 0] * rc + parent[..., 1]) * rc + parent[..., 2]
        pflat = jnp.where(mask_f, pflat, rc3)
        psite = lookup_c[pflat]                              # (Af,)
        ok = psite >= 0
        hp = hc[jnp.maximum(psite, 0)]                       # (Af, Cin)
        hp = jnp.where(ok[:, None], hp, 0.0).astype(dt)
        t = 1 - (ijk_f % 2)                                  # (Af, 3)
        tidx = (t[:, 0] * 2 + t[:, 1]) * 2 + t[:, 2]         # (Af,)
        out = jnp.zeros((ijk_f.shape[0], kern.shape[-1]), jnp.float32)
        for ti in range(8):
            sel = (tidx == ti).astype(dt)[:, None]
            out = out + jax.lax.dot_general(
                hp * sel,
                kern[ti].astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return out + p["bias"]

    out = jax.vmap(one)(
        sp_fine.ijk, sp_fine.site_mask, sp_coarse.lookup, h_coarse
    )
    return jnp.where(sp_fine.site_mask[..., None], out, 0.0)


def site_layer_norm_init(c: int) -> dict:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
    }


def site_layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-site LayerNorm over channels (stat-free, padding-immune)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def gather_point_logits(
    site_values: jax.Array,
    sp: SparseVoxels,
    points: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Per-point readout: each point takes its voxel's site value
    (sparse devoxelize, nearest). Points in dropped/over-capacity voxels
    get zeros."""
    flat, _, _ = voxel_indices(points[..., :3], mask, sp.grid_size)

    def one(vals, lookup, flat_e):
        site = lookup[flat_e]                      # (M,), -1 if no site
        ok = site >= 0
        out = vals[jnp.maximum(site, 0)]
        return jnp.where(ok[:, None], out, 0.0)

    out = jax.vmap(one)(site_values, sp.lookup, flat)
    return jnp.where(mask[..., None], out, 0.0)
