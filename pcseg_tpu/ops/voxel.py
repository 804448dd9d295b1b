"""Voxelize / devoxelize: point clouds <-> dense voxel grids.

North-star ops (BASELINE.json; not present in the reference, whose model is
pure PointNet — SURVEY.md §0): quantize each event's points onto an
R^3 grid, scatter-reduce point features into voxels, run a 3D conv net on
the grid, then gather per-point predictions back out.

XLA formulation: one fused scatter-add per event (vmapped over the batch),
with a spill row for masked points — O(points) work regardless of padding,
static shapes throughout. The per-event bounding box is computed from valid
points only, so padding zeros never stretch the grid.

``devoxelize`` supports nearest-voxel gather and trilinear interpolation
over the 8 surrounding voxel centers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-6


class VoxelGrid(NamedTuple):
    features: jax.Array   # (B, R, R, R, C) mean point features per voxel
    counts: jax.Array     # (B, R, R, R) points per voxel
    lo: jax.Array         # (B, 3) event-box lower corner
    scale: jax.Array      # (B, 3) voxels per unit length


def _event_box(coords: jax.Array, mask: jax.Array):
    """Masked per-event AABB. coords (B, M, 3), mask (B, M).

    Fully-masked events (batch-dim padding rows) get a unit box at the
    origin — without this, +/-inf bounds produce NaNs downstream that leak
    through masked-out forward values into the BACKWARD pass (0 * NaN)."""
    big = jnp.asarray(3.4e38, coords.dtype)
    m = mask[..., None]
    has_valid = jnp.any(mask, axis=1)[:, None]
    lo = jnp.min(jnp.where(m, coords, big), axis=1)
    hi = jnp.max(jnp.where(m, coords, -big), axis=1)
    lo = jnp.where(has_valid, lo, 0.0)
    hi = jnp.where(has_valid, hi, 1.0)
    # degenerate (flat axis) -> at least EPS span to avoid div0
    span = jnp.maximum(hi - lo, _EPS)
    return lo, span


def voxel_indices(
    coords: jax.Array, mask: jax.Array, grid_size: int
):
    """(B, M, 3) coords -> (B, M) flat voxel ids in [0, R^3), plus box.

    Masked points get id R^3 (the spill voxel)."""
    lo, span = _event_box(coords, mask)
    scale = grid_size / span                       # (B, 3)
    ijk = jnp.floor((coords - lo[:, None, :]) * scale[:, None, :])
    ijk = jnp.clip(ijk.astype(jnp.int32), 0, grid_size - 1)
    flat = (ijk[..., 0] * grid_size + ijk[..., 1]) * grid_size + ijk[..., 2]
    flat = jnp.where(mask, flat, grid_size ** 3)
    return flat, lo, scale


def voxelize(
    points: jax.Array,
    mask: jax.Array,
    grid_size: int,
    feature_dim: int | None = None,
) -> VoxelGrid:
    """Scatter-mean point features into an R^3 grid.

    points (B, M, 3+F): xyz + features (the reference schema's 4th column
    is energy, pcs.py:34). Features scattered are the raw columns 3:
    plus a constant-1 occupancy channel; output C = F + 1.
    """
    coords = points[..., :3].astype(jnp.float32)
    feats = points[..., 3:].astype(jnp.float32)
    if feature_dim is not None:
        feats = feats[..., :feature_dim]
    occ = jnp.ones(feats.shape[:-1] + (1,), feats.dtype)
    feats = jnp.concatenate([feats, occ], axis=-1)    # (B, M, C)
    c = feats.shape[-1]
    r3 = grid_size ** 3

    flat, lo, scale = voxel_indices(coords, mask, grid_size)
    feats = jnp.where(mask[..., None], feats, 0.0)

    def scatter_one(flat_e, feats_e):
        sums = jnp.zeros((r3 + 1, c), jnp.float32).at[flat_e].add(feats_e)
        cnts = jnp.zeros((r3 + 1,), jnp.float32).at[flat_e].add(1.0)
        return sums[:r3], cnts[:r3]

    sums, cnts = jax.vmap(scatter_one)(flat, feats)
    mean = sums / jnp.maximum(cnts[..., None], 1.0)
    shape = (points.shape[0], grid_size, grid_size, grid_size)
    return VoxelGrid(
        features=mean.reshape(shape + (c,)),
        counts=cnts.reshape(shape),
        lo=lo,
        scale=scale,
    )


def devoxelize_nearest(
    grid_feats: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    lo: jax.Array,
    scale: jax.Array,
) -> jax.Array:
    """Gather each point's voxel value. grid_feats (B, R, R, R, C) ->
    (B, M, C)."""
    r = grid_feats.shape[1]
    coords = points[..., :3].astype(jnp.float32)
    ijk = jnp.floor((coords - lo[:, None, :]) * scale[:, None, :])
    ijk = jnp.clip(ijk.astype(jnp.int32), 0, r - 1)
    flat = (ijk[..., 0] * r + ijk[..., 1]) * r + ijk[..., 2]
    flat = jnp.where(mask, flat, 0)
    gathered = jax.vmap(lambda g, f: g.reshape(r * r * r, -1)[f])(
        grid_feats, flat
    )
    return jnp.where(mask[..., None], gathered, 0.0)


def devoxelize_trilinear(
    grid_feats: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    lo: jax.Array,
    scale: jax.Array,
) -> jax.Array:
    """Trilinear interpolation over the 8 voxel centers around each point."""
    r = grid_feats.shape[1]
    coords = points[..., :3].astype(jnp.float32)
    # continuous voxel coords, centered: voxel i covers [i, i+1), center i+.5
    u = (coords - lo[:, None, :]) * scale[:, None, :] - 0.5
    # masked points must stay finite: their forward value is zeroed below,
    # but a NaN here would poison gradients (0 * NaN in the VJP)
    u = jnp.where(mask[..., None], u, 0.0)
    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)

    flat_grid = grid_feats.reshape(grid_feats.shape[0], r * r * r, -1)

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ijk = i0 + jnp.array([dx, dy, dz], jnp.int32)
                ijk_c = jnp.clip(ijk, 0, r - 1)
                flat = (
                    ijk_c[..., 0] * r + ijk_c[..., 1]
                ) * r + ijk_c[..., 2]
                w = (
                    jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                    * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                    * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
                )
                gathered = jax.vmap(lambda g, f: g[f])(flat_grid, flat)
                out = out + gathered * w[..., None]
    return jnp.where(mask[..., None], out, 0.0)
