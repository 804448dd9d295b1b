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

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-6
# HBM cap for the devoxelize-backward one-hot operand (module-level so
# tests can shrink it to exercise the chunked path on small shapes).
# 512 MB keeps the benchmarked configs (B8/M8192/R64 bf16 and
# B1/M16384/R128 bf16, both exactly 512 MB) on the measured single-shot
# contraction; only larger configs pay the chunked scan.
_DEVOX_BWD_BUDGET_BYTES = 1 << 29


def _zeros_like_vma(shape, ref):
    """f32 zeros carrying ``ref``'s shard_map varying-axes type — a scan
    accumulator under vma typing must match its data-dependent updates."""
    z = jnp.zeros(shape, jnp.float32)
    vma = getattr(jax.typeof(ref), "vma", frozenset())
    if vma:
        z = jax.lax.pcast(z, tuple(vma), to="varying")
    return z


def _scan_point_chunks(fn, arrays, pad_values, *, m, row_bytes, init=None):
    """Run ``fn(*point_chunks)`` over point-axis chunks sized so the
    per-chunk (B, Mc, R*R) one-hot operand stays under the HBM budget.

    The one shared implementation of the chunking loop used by the
    matmul voxelizer, the matmul devoxelize forward and the devoxelize
    backward (the budget math, padding, reshape-transpose and lax.scan
    glue were previously triplicated).

    - ``arrays``: per-point operands, each (B, M) or (B, M, K); padded to
      a chunk multiple with the matching ``pad_values`` entry (sentinel
      index / zero — both make padded slots contribute nothing).
    - ``chunk = budget // row_bytes`` where ``row_bytes`` is one point's
      contribution to the dominant operand. When nothing needs chunking,
      calls ``fn(*arrays)`` directly (the benchmarked fast path).
    - ``init`` not None: ``fn`` returns a reduction over points; chunks
      accumulate into ``init`` (pass `_zeros_like_vma` for shard_map).
    - ``init`` None: ``fn`` returns per-point outputs (B, Mc, C); chunk
      outputs are restitched along the point axis and sliced back to m.
    """
    b = arrays[0].shape[0]
    chunk = max(1, min(m, _DEVOX_BWD_BUDGET_BYTES // max(row_bytes, 1)))
    if chunk >= m:
        return fn(*arrays)
    nchunks = -(-m // chunk)
    pad = nchunks * chunk - m

    def prep(v, pv):
        if v.ndim == 3:
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)), constant_values=pv)
            return vp.reshape(
                b, nchunks, chunk, v.shape[-1]
            ).transpose(1, 0, 2, 3)
        vp = jnp.pad(v, ((0, 0), (0, pad)), constant_values=pv)
        return vp.reshape(b, nchunks, chunk).transpose(1, 0, 2)

    xs = tuple(prep(v, pv) for v, pv in zip(arrays, pad_values))
    if init is not None:
        def body(acc, chunks):
            return acc + fn(*chunks), None

        out, _ = jax.lax.scan(body, init, xs)
        return out

    def body(_, chunks):
        return None, fn(*chunks)

    _, stacked = jax.lax.scan(body, None, xs)        # (n, B, chunk, C)
    return stacked.transpose(1, 0, 2, 3).reshape(
        b, -1, stacked.shape[-1]
    )[:, :m]


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


def _voxelize_scatter(flat, feats, r3, c):
    """Per-event fused scatter-add (sums + counts)."""

    def scatter_one(flat_e, feats_e):
        sums = jnp.zeros((r3 + 1, c), jnp.float32).at[flat_e].add(feats_e)
        cnts = jnp.zeros((r3 + 1,), jnp.float32).at[flat_e].add(1.0)
        return sums[:r3], cnts[:r3]

    return jax.vmap(scatter_one)(flat, feats)


def _use_plane_kernels(dt, r) -> bool:
    """Trace-time dispatch to the fused onehot_contract Pallas kernels.

    TPU-only (cf. parallel/gp.py fused-core fallback): the Pallas HLO
    interpreter can't run under vma-typed shard_map, and the CPU-mesh
    dryrun/tests reach these through voxelize/devoxelize. R<=64 keeps
    the (R^2, N) VMEM accumulator + in-kernel one-hot tiles comfortable.
    core.portable.force_xla_paths() overrides to the XLA form (serving
    export for multiple platforms must not bake the kernels in)."""
    from pcseg_tpu.core.portable import tpu_kernels_enabled

    return (
        jnp.dtype(dt) == jnp.bfloat16
        and r <= 64
        and tpu_kernels_enabled()
    )


def _voxelize_matmul_raw(flat, feats, r, dt):
    """Sums + counts as ONE batched one-hot MXU contraction, returned in
    the raw (B, R^2, R*(C+1)) layout (x-major, channel-minor columns;
    the count rides as the last channel).

    Same trick as the devoxelize backward (``_devox_bwd``): the per-point
    one-hot over R^3 factorizes per axis, so
    ``sums[z,y,x,c] = sum_p dz[p,z] dy[p,y] dx[p,x] f[p,c]`` becomes a
    (R^2, M) @ (M, R*(C+1)) contraction per event — regular MXU work
    instead of a scatter that serializes per colliding row on TPU. A
    ones channel rides along as the counts (0/1 one-hots accumulate
    exactly in the f32 MXU accumulator). Masked points carry the
    sentinel id R^3, whose z one-hot is all-zero — they contribute
    nothing (the spill-row semantics of the scatter path). ``dt`` is
    the operand precision for the FEATURE values (counts are exact
    either way); chunked over points like the devoxelize backward.
    """
    b, m, c = feats.shape
    r3 = r * r * r
    ext = jnp.concatenate(
        [feats, jnp.ones(feats.shape[:-1] + (1,), feats.dtype)], axis=-1
    )
    ext = jnp.where(flat[..., None] < r3, ext, 0.0)

    if _use_plane_kernels(dt, r):
        # fused path (R<=64: the (R^2, R*(C+1)) VMEM accumulator and the
        # in-kernel one-hot tiles fit comfortably): the kernel takes the
        # flat voxel ids + feature rows directly and builds the zy
        # one-hot AND the x/channel expansion tile-by-tile in VMEM —
        # neither the (B, M, R^2) one-hot (512 MB at B8 x 8192 x R64)
        # nor the (B, M, R*(C+1)) expansion nor the per-axis index
        # arrays (the reshape.51xx/pad chain in the r3 xplane profile)
        # touch HBM. TPU-only dispatch (cf. parallel/gp.py fused-core
        # fallback): the Pallas HLO interpreter can't run under
        # vma-typed shard_map, and the dryrun's CPU-mesh voxel leg
        # reaches this through voxelize.
        from pcseg_tpu.ops.pallas.onehot_contract import voxelize_contract

        return voxelize_contract(flat.astype(jnp.int32), ext, r)

    fz = flat // (r * r)                      # == r for masked points
    fy = (flat // r) % r
    fx = flat % r
    iota = jnp.arange(r, dtype=flat.dtype)

    def contract(fz_c, fy_c, fx_c, ext_c):
        wz = (fz_c[..., None] == iota).astype(dt)          # (B, Mc, R)
        wy = (fy_c[..., None] == iota).astype(dt)
        wx = (fx_c[..., None] == iota).astype(dt)
        a = (wz[..., :, None] * wy[..., None, :]).reshape(b, -1, r * r)
        d1 = (wx[..., :, None] * ext_c.astype(dt)[..., None, :]
              ).reshape(b, -1, r * (c + 1))
        return jax.lax.dot_general(
            a, d1, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (B, R^2, R*(C+1))

    # padded slots carry the sentinel index (zero one-hot row)
    return _scan_point_chunks(
        contract, (fz, fy, fx, ext), (r, r, r, 0.0),
        m=m, row_bytes=b * r * r * jnp.dtype(dt).itemsize,
        init=_zeros_like_vma((b, r * r, r * (c + 1)), feats),
    )


def _voxelize_matmul(flat, feats, r, dt):
    b, m, c = feats.shape
    out = _voxelize_matmul_raw(flat, feats, r, dt)
    out = out.reshape(b, r, r, r, c + 1)
    return out[..., :c], out[..., c]


def resolve_voxelize_impl(impl: str, grid_size: int, c: int) -> str:
    """'auto' -> measured crossover: the scatter serializes at ~60 ns
    per point on TPU while the matmul costs ~2*R^3*C MXU FLOPs/point
    (~120 TFLOP/s effective bf16), so the one-hot contraction wins
    whenever R^3*C is small enough. c counts the occupancy channel."""
    if impl != "auto":
        return impl
    return "matmul" if grid_size ** 3 * c <= 4_000_000 else "scatter"


def voxelize_packed(
    points: jax.Array,
    mask: jax.Array,
    grid_size: int,
    w0: int,
    matmul_dtype=jnp.bfloat16,
):
    """Voxelize straight into the lane-packed ``(B, D, H*U, 128)`` bf16
    form of ops/pallas/conv3d_block (channels zero-padded to ``w0``).

    Why: the fused U-Net's stem consumes the grid packed and channel-
    padded, and XLA lays the intermediate 5-D (B, R, R, R, C) arrays out
    d-minor, so the pad + pack round-trips two full-grid layout copies
    per step (fwd + the backward's rematerialized re-pad — ~1.2 ms of
    the 23.8 ms 64^3 step, per the xplane profile). Here the mean
    division runs on the matmul voxelizer's RAW (B, R^2, R*(C+1))
    contraction output (count column broadcast with a 0/1 placement
    matmul), and a second 0/1 placement contraction emits the packed
    lane order directly — every reshape on the way to the kernel is a
    row-major bitcast. Values are bit-identical to
    ``pack_grid(pad(voxelize(impl="matmul").features.astype(bf16)))``:
    the division happens in f32 exactly as in ``voxelize``, the bf16
    cast after it, and the placement matmuls move bf16 values verbatim.

    Returns (packed, lo, scale); counts never materialize (the voxel
    U-Net doesn't use them).
    """
    import numpy as np

    r = grid_size
    coords = points[..., :3].astype(jnp.float32)
    feats = points[..., 3:].astype(jnp.float32)
    occ = jnp.ones(feats.shape[:-1] + (1,), feats.dtype)
    feats = jnp.concatenate([feats, occ], axis=-1)    # (B, M, C)
    c = feats.shape[-1]
    c1 = c + 1
    p = 128 // w0
    if 128 % w0 or r % p:
        raise ValueError(
            f"voxelize_packed needs w0 dividing 128 and R a multiple of "
            f"128/w0; got w0={w0}, R={r}"
        )
    if c > w0:
        # the placement matrix maps column w*c1+ch to lane (w%p)*w0+ch;
        # ch >= w0 would land in the NEXT sub-voxel's channel slot and sum
        # adjacent x-voxels' features into each other — fail loudly like
        # the non-packed path's negative jnp.pad does
        raise ValueError(
            f"voxelize_packed: {c} grid channels (features + occupancy) "
            f"exceed the packed stem width w0={w0}"
        )
    u = r // p

    flat, lo, scale = voxel_indices(coords, mask, r)
    feats = jnp.where(mask[..., None], feats, 0.0)
    sums = _voxelize_matmul_raw(flat, feats, r, matmul_dtype)

    # count broadcast: S[x*c1 + c, x*c1 + k] = 1 — one exact f32 0/1
    # contraction puts each voxel's count under all its feature columns
    s_np = np.zeros((r * c1, r * c1), np.float32)
    for x in range(r):
        s_np[x * c1 + c, x * c1 : x * c1 + c1] = 1.0
    cnt = jax.lax.dot_general(
        sums, jnp.asarray(s_np), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mean = (sums / jnp.maximum(cnt, 1.0)).astype(jnp.bfloat16)

    # packing placement: column w*c1 + ch -> u*128 + (w % p)*w0 + ch
    e_np = np.zeros((r * c1, u * 128), np.float32)
    for w in range(r):
        for ch in range(c):
            e_np[w * c1 + ch, (w // p) * 128 + (w % p) * w0 + ch] = 1.0
    packed = jax.lax.dot_general(
        mean, jnp.asarray(e_np, np.float32).astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)                            # (B, R^2, U*128)
    b = packed.shape[0]
    return packed.reshape(b, r, r * u, 128), lo, scale


def voxelize(
    points: jax.Array,
    mask: jax.Array,
    grid_size: int,
    feature_dim: int | None = None,
    impl: str = "scatter",
    matmul_dtype=jnp.bfloat16,
) -> VoxelGrid:
    """Scatter-mean point features into an R^3 grid.

    points (B, M, 3+F): xyz + features (the reference schema's 4th column
    is energy, pcs.py:34). Features scattered are the raw columns 3:
    plus a constant-1 occupancy channel; output C = F + 1.

    ``impl``: "scatter" (XLA fused scatter-add; f32-exact), "matmul"
    (factorized one-hot MXU contraction — see ``_voxelize_matmul``;
    counts and means are exact up to feature rounding into
    ``matmul_dtype``, pass jnp.float32 for bit-comparable features), or
    "auto" (pick by the measured crossover: the scatter serializes at
    ~60 ns/point on TPU while the matmul costs ~2*R^3*(C+1) MXU
    FLOPs/point, so the one-hot contraction wins whenever
    R^3*(C+1) is small enough — 4.11 -> 1.55 ms at B8 x 8192 x R64/C6,
    but 0.94 -> 1.23 ms at B1 x 16384 x R128 where the R^3 term
    dominates; experiments/bench_voxelize.py 2026-08-17).
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

    impl = resolve_voxelize_impl(impl, grid_size, c)
    if impl == "matmul":
        sums, cnts = _voxelize_matmul(flat, feats, grid_size, matmul_dtype)
        sums = sums.reshape(sums.shape[0], r3, c)
        cnts = cnts.reshape(cnts.shape[0], r3)
    elif impl == "scatter":
        sums, cnts = _voxelize_scatter(flat, feats, r3, c)
    else:
        raise ValueError(f"unknown voxelize impl {impl!r}")
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


def _trilinear_u(points, mask, lo, scale):
    """Continuous, centered voxel coords (masked points pinned to 0)."""
    coords = points[..., :3].astype(jnp.float32)
    # continuous voxel coords, centered: voxel i covers [i, i+1), center i+.5
    u = (coords - lo[:, None, :]) * scale[:, None, :] - 0.5
    # masked points must stay finite: their forward value is zeroed below,
    # but a NaN here would poison gradients (0 * NaN in the VJP)
    return jnp.where(mask[..., None], u, 0.0)


def _devox_gather_on_flat(flat_grid, u, mask, r):
    """8-tap trilinear gather from the flat (B, R^3, C) row view."""
    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)

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


def _devoxelize_trilinear_ref(grid_feats, points, mask, lo, scale):
    """Plain gather composition (XLA autodiff scatters in its VJP)."""
    r = grid_feats.shape[1]
    u = _trilinear_u(points, mask, lo, scale)
    flat_grid = grid_feats.reshape(grid_feats.shape[0], r * r * r, -1)
    return _devox_gather_on_flat(flat_grid, u, mask, r)


def _devox_fwd_contract(u, grid2, r, c, dt):
    """One point-chunk's trilinear gather as matmuls: (B, Mc, C).

    Stage 1 contracts the (z, y) plane pair on the MXU
    ((B, Mc, R^2) @ (B, R^2, R*C)); stage 2 is the 2-tap x interpolation
    as an elementwise multiply + small reduce. Same factorization as the
    backward (``_devox_contract``), run forward."""
    b = u.shape[0]
    wz = _axis_weights(u[..., 0], r).astype(dt)             # (B, Mc, R)
    wy = _axis_weights(u[..., 1], r).astype(dt)
    wx = _axis_weights(u[..., 2], r)                        # f32 stage 2
    a = (wz[..., :, None] * wy[..., None, :]).reshape(b, -1, r * r)
    t = jax.lax.dot_general(
        a, grid2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # (B, Mc, R*C)
    t = t.reshape(b, -1, r, c)
    return jnp.sum(t * wx[..., None], axis=2)


def _devoxelize_trilinear_matmul(grid_feats, points, mask, lo, scale, dt):
    """Forward trilinear devoxelize as one-hot MXU contractions.

    The gather composition runs 8 per-tap row gathers that serialize on
    TPU (~4.1 ms of the 64^3 train step at B8 x 8192 — the single
    largest non-conv cost in the r3 profile, experiments/
    profile_steps.py). This replaces them with the same factorized
    contraction the backward already uses, chunked over points so the
    (B, Mc, R^2) operand stays under the budget. ``dt`` is the operand
    precision (f32 accumulation); the value matches the gather path to
    ``dt`` rounding."""
    b, r = grid_feats.shape[0], grid_feats.shape[1]
    c = grid_feats.shape[-1]
    grid2 = grid_feats.reshape(b, r * r, r * c)
    return _devox_matmul_on_grid2(grid2, r, c, points, mask, lo, scale, dt)


def _devox_matmul_on_grid2(grid2, r, c, points, mask, lo, scale, dt):
    """Matmul devoxelize forward on the (B, R*R, R*C) grid2 layout.
    Casts ``grid2`` to ``dt`` itself (the single cast site — callers
    pass their native-dtype grid2)."""
    b = grid2.shape[0]
    m = points.shape[1]
    u = _trilinear_u(points, mask, lo, scale)
    grid2 = grid2.astype(dt)

    if _use_plane_kernels(dt, r):
        # fused path (R<=64, see _voxelize_matmul_raw): the kernel takes
        # the continuous coords directly, builds the zy tap matrix in
        # VMEM, and runs the 2-tap x interpolation in its epilogue — the
        # (B, M, R*C) x-line (67 MB f32 at B8 x 8192 x R64/C4, plus a
        # layout copy and the reduce, per the r3 xplane profile) never
        # touches HBM and the output is the final (B, M, C), already
        # masked.
        from pcseg_tpu.ops.pallas.onehot_contract import trilinear_gather

        return trilinear_gather(u, mask, grid2)

    out = _scan_point_chunks(
        lambda uc: _devox_fwd_contract(uc, grid2, r, c, dt),
        (u,), (0.0,),
        m=m, row_bytes=b * r * r * jnp.dtype(dt).itemsize,
    )
    return jnp.where(mask[..., None], out, 0.0)


def resolve_devoxelize_impl(impl: str, grid_size: int, c: int) -> str:
    """'auto' -> matmul below an R^3*(C+1) crossover, where the gathers'
    ~8 ns/row serialization loses to the contraction's R^2*(R*C) MXU
    work. Same 4e6 threshold as ``resolve_voxelize_impl`` but counting
    C+1 columns: the devoxelize contraction carries the grid2 pair
    (value + parity) per channel, the voxelizer only its occupancy
    column — so at a boundary channel count the two CAN resolve
    differently (each to its own measured winner)."""
    if impl != "auto":
        return impl
    return (
        "matmul" if grid_size ** 3 * (c + 1) <= 4_000_000 else "gather"
    )


def devoxelize_trilinear(
    grid_feats: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    lo: jax.Array,
    scale: jax.Array,
    bwd_dtype=jnp.bfloat16,
    impl: str = "gather",
) -> jax.Array:
    """Trilinear interpolation over the 8 voxel centers around each point.

    Custom VJP: XLA differentiates the gather composition into an 8-tap
    scatter-add over the dense grid, which serializes on TPU (measured
    ~21 ms of a 25.6 ms devox+CE backward at B8 x 8192 pts, R=64 —
    experiments/bench_unet_glue.py). The trilinear weight factorizes
    per axis (the fwd clips each axis independently), so
    ``dgrid = sum_p Wz[p,:] x Wy[p,:] x Wx[p,:] * go[p,:]`` becomes two
    one-hot expansions and ONE batched MXU contraction
    ``(zy, p) @ (p, xc)``.

    ``bwd_dtype`` sets the precision of that contraction's operands
    (accumulation is always f32 on the MXU). bfloat16 is the training
    default (grid gradients feed bf16 matmul backwards anyway); models
    computing in float32 should pass jnp.float32 for full-precision
    gradients. The backward chunks the point axis so the one-hot
    operand never exceeds ~512 MB regardless of (B, M, R).

    ``impl`` picks the FORWARD formulation: "gather" (8 per-tap row
    gathers; f32-exact), "matmul" (``_devoxelize_trilinear_matmul`` —
    the mirrored one-hot contraction, values match to ``bwd_dtype``
    operand rounding), or "auto" (matmul below the same R^3*C crossover
    as ``voxelize``, where the gathers' ~8 ns/row serialization loses to
    the contraction's R^2*(R*C) MXU work). The backward is the same
    contraction either way.

    NOTE: gradients flow to ``grid_feats`` only; ``points``/``lo``/
    ``scale`` get zero cotangents (they are data inputs in every
    training path — a point-coordinate-optimizing use would need the
    reference VJP of ``_devoxelize_trilinear_ref``).
    """
    impl = resolve_devoxelize_impl(
        impl, grid_feats.shape[1], grid_feats.shape[-1]
    )
    if impl not in ("gather", "matmul"):
        raise ValueError(f"unknown devoxelize impl {impl!r}")
    return _devoxelize_trilinear_vjp(
        grid_feats, points, mask, lo, scale, jnp.dtype(bwd_dtype), impl
    )


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _devoxelize_trilinear_vjp(grid_feats, points, mask, lo, scale, bwd_dtype,
                              impl):
    if impl == "matmul":
        return _devoxelize_trilinear_matmul(
            grid_feats, points, mask, lo, scale, bwd_dtype
        )
    return _devoxelize_trilinear_ref(grid_feats, points, mask, lo, scale)


def _axis_weights(u1, r):
    """One axis' 2-tap interpolation matrix (B, M, R), clipped like fwd."""
    i0 = jnp.floor(u1)
    frac = (u1 - i0).astype(jnp.float32)
    i0 = i0.astype(jnp.int32)
    t0 = jnp.clip(i0, 0, r - 1)[..., None]
    t1 = jnp.clip(i0 + 1, 0, r - 1)[..., None]
    iota = jnp.arange(r, dtype=jnp.int32)
    return ((1.0 - frac)[..., None] * (iota == t0)
            + frac[..., None] * (iota == t1))


def _devox_fwd(grid_feats, points, mask, lo, scale, bwd_dtype, impl):
    out = _devoxelize_trilinear_vjp(
        grid_feats, points, mask, lo, scale, bwd_dtype, impl
    )
    # zero-size token carries the primal's shape/dtype (residuals must be
    # JAX types, not raw dtypes)
    token = jnp.zeros(grid_feats.shape[:1] + grid_feats.shape[1:2]
                      + (0,), grid_feats.dtype)
    return out, (points, mask, lo, scale, token, grid_feats.shape[-1])


def _devox_contract(u, go, r, c, dt):
    """One point-chunk's grid cotangent: (B, R*R, R*C) f32."""
    b = u.shape[0]
    wz = _axis_weights(u[..., 0], r).astype(dt)             # (B, Mc, R)
    wy = _axis_weights(u[..., 1], r).astype(dt)
    wx = _axis_weights(u[..., 2], r).astype(dt)
    # (B, Mc, R*R) and (B, Mc, R*C) expansions, contract the point axis
    a = (wz[..., :, None] * wy[..., None, :]).reshape(b, -1, r * r)
    d1 = (wx[..., :, None] * go.astype(dt)[..., None, :]
          ).reshape(b, -1, r * c)
    return jax.lax.dot_general(
        a, d1, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # (B, R*R, R*C)


def _devox_dgrid2(u, go, r, c, bwd_dtype):
    """The grid cotangent in the (B, R*R, R*C) f32 grid2 layout.

    ``go`` must already be masked. Shared by the 5-D and grid2 VJPs —
    only the final reshape/cast differs between them."""
    b, m = go.shape[:2]
    if _use_plane_kernels(bwd_dtype, r):
        # fused path (R<=64, see _voxelize_matmul_raw): the kernel takes
        # the continuous coords + point cotangents directly and builds
        # both the zy tap matrix AND the (Mc, R*C) x/cotangent expansion
        # in VMEM (the expansion was a 33 MB HBM operand at
        # B8 x 8192 x R64/C4 in the r3 xplane profile)
        from pcseg_tpu.ops.pallas.onehot_contract import trilinear_scatter

        return trilinear_scatter(u, go, r)

    # chunk the point axis so the (B, Mc, R*R) one-hot operand stays
    # under the budget (at B8/M8192/R128 the unchunked operand is ~2 GB);
    # padded points carry zero cotangents -> contribute nothing
    return _scan_point_chunks(
        lambda uc, gc: _devox_contract(uc, gc, r, c, bwd_dtype),
        (u, go), (0.0, 0.0),
        m=m, row_bytes=b * r * r * jnp.dtype(bwd_dtype).itemsize,
        init=_zeros_like_vma((b, r * r, r * c), go),
    )


def _devox_bwd(bwd_dtype, impl, res, go):
    points, mask, lo, scale, token, c = res
    b, r = token.shape[0], token.shape[1]
    gdtype = token.dtype
    u = _trilinear_u(points, mask, lo, scale)
    go = jnp.where(mask[..., None], go, 0.0)
    dgrid = _devox_dgrid2(u, go, r, c, bwd_dtype)
    dgrid = dgrid.reshape(b, r, r, r, c).astype(gdtype)
    return (
        dgrid,
        jnp.zeros_like(points),
        None,
        jnp.zeros_like(lo),
        jnp.zeros_like(scale),
    )


_devoxelize_trilinear_vjp.defvjp(_devox_fwd, _devox_bwd)


def devoxelize_trilinear_grid2(
    grid2: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    lo: jax.Array,
    scale: jax.Array,
    bwd_dtype=jnp.bfloat16,
    impl: str = "matmul",
) -> jax.Array:
    """``devoxelize_trilinear`` on the flat (B, R*R, R*C) "grid2" layout.

    Same math as the 5-D formulations (they reshape to this layout
    internally anyway); taking and differentiating grid2 DIRECTLY lets a
    producer that already emits it (``head1x1_grid2`` on the packed
    Pallas core) skip the 5-D round-trip — XLA lays narrow-C NDHWC grids
    out W-minor, so the 5-D hand-off costs a full-grid relayout copy in
    the forward and a pad+relayout in the backward (~1 ms of the 64^3
    step and 1.45 ms of the 128^3 step in the r3 xplane profiles).
    Gradients flow to ``grid2`` only, like ``devoxelize_trilinear``.

    ``impl`` picks the forward like ``devoxelize_trilinear``: "gather"
    runs the 8 per-tap row gathers on the ``(B, R^3, C)`` row view of
    grid2 (a row-major bitcast — f32-exact), "matmul" the one-hot
    contraction, "auto" the measured crossover. The backward is the
    shared ``_devox_dgrid2`` contraction either way.
    """
    rr = grid2.shape[1]
    r = math.isqrt(rr)
    if r * r != rr or grid2.shape[2] % r:
        raise ValueError(f"grid2 shape {grid2.shape} is not (B, R*R, R*C)")
    impl = resolve_devoxelize_impl(impl, r, grid2.shape[2] // r)
    if impl not in ("gather", "matmul"):
        raise ValueError(f"unknown devoxelize impl {impl!r}")
    return _devox_grid2_vjp(
        grid2, points, mask, lo, scale, jnp.dtype(bwd_dtype), impl
    )


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _devox_grid2_vjp(grid2, points, mask, lo, scale, bwd_dtype, impl):
    r = math.isqrt(grid2.shape[1])
    c = grid2.shape[2] // r
    if impl == "gather":
        b = grid2.shape[0]
        u = _trilinear_u(points, mask, lo, scale)
        return _devox_gather_on_flat(
            grid2.reshape(b, r * r * r, c), u, mask, r
        )
    return _devox_matmul_on_grid2(
        grid2, r, c, points, mask, lo, scale, bwd_dtype
    )


def _devox_grid2_fwd(grid2, points, mask, lo, scale, bwd_dtype, impl):
    out = _devox_grid2_vjp(grid2, points, mask, lo, scale, bwd_dtype, impl)
    token = jnp.zeros(grid2.shape[:2] + (0,), grid2.dtype)
    return out, (points, mask, lo, scale, token, grid2.shape[2])


def _devox_grid2_bwd(bwd_dtype, impl, res, go):
    points, mask, lo, scale, token, rc = res
    b, rr = token.shape[0], token.shape[1]
    r = math.isqrt(rr)
    c = rc // r
    u = _trilinear_u(points, mask, lo, scale)
    go = jnp.where(mask[..., None], go, 0.0)
    dgrid = _devox_dgrid2(u, go, r, c, bwd_dtype).astype(token.dtype)
    return (
        dgrid,
        jnp.zeros_like(points),
        None,
        jnp.zeros_like(lo),
        jnp.zeros_like(scale),
    )


_devox_grid2_vjp.defvjp(_devox_grid2_fwd, _devox_grid2_bwd)
