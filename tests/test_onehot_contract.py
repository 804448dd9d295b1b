"""Direct parity tests for the tap-fused one-hot plane kernels.

ops/voxel.py dispatches to these only on real TPU (the Pallas HLO
interpreter can't run under vma-typed shard_map), so the CPU suite
exercises the kernels here explicitly in interpret mode against dense
numpy tap/one-hot formulations mirroring ops/voxel.py's XLA paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _axis_taps_np(u1, r):
    """Mirror of onehot_contract._axis_taps (== ops/voxel._axis_weights)."""
    i0 = np.floor(u1)
    frac = (u1 - i0).astype(np.float32)
    i0 = i0.astype(np.int32)
    t0 = np.clip(i0, 0, r - 1)
    t1 = np.clip(i0 + 1, 0, r - 1)
    return ((t0, 1.0 - frac), (t1, frac))


def _zy_plane_np(u, r):
    """(B, M, R^2) trilinear zy tap matrix, f32-accumulated duplicates
    rounded to bf16 once — the kernel's _zy_plane order."""
    b, m = u.shape[:2]
    a = np.zeros((b, m, r * r), np.float32)
    for iz, wz in _axis_taps_np(u[..., 0], r):
        for iy, wy in _axis_taps_np(u[..., 1], r):
            idx = iz * r + iy
            np.put_along_axis(
                a, idx[..., None],
                np.take_along_axis(a, idx[..., None], axis=-1)
                + (wz * wy)[..., None],
                axis=-1,
            )
    return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)


def _xline_np(u1, r, c):
    """(B, M, R*C) f32 x-interpolation line (duplicates accumulated)."""
    b, m = u1.shape
    w = np.zeros((b, m, r), np.float32)
    for ix, wx in _axis_taps_np(u1, r):
        np.put_along_axis(
            w, ix[..., None],
            np.take_along_axis(w, ix[..., None], axis=-1) + wx[..., None],
            axis=-1,
        )
    return np.repeat(w, c, axis=-1)


def test_voxelize_contract(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import voxelize_contract

    b, m, r, c1 = 2, 700, 8, 3                # m % chunk != 0 -> pad path
    flat = rng.integers(0, r**3 + 1, (b, m)).astype(np.int32)
    ext = rng.normal(size=(b, m, c1)).astype(np.float32)
    ext[flat == r**3] = 0.0                   # masked rows already zero
    out = voxelize_contract(
        jnp.asarray(flat), jnp.asarray(ext), r, interpret=True
    )
    assert out.shape == (b, r * r, r * c1)
    ref = np.zeros((b, r * r, r * c1), np.float32)
    extb = np.asarray(jnp.asarray(ext, jnp.bfloat16), np.float32)
    for bi in range(b):
        for p in range(m):
            f = flat[bi, p]
            if f >= r**3:
                continue
            zy, x = f // r, f % r
            ref[bi, zy, x * c1 : (x + 1) * c1] += extb[bi, p]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_trilinear_scatter(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import trilinear_scatter

    b, m, r, c = 2, 600, 6, 4
    # coords spanning outside [0, R-1] exercise the clipped duplicate taps
    u = (rng.random((b, m, 3)) * (r + 1) - 1).astype(np.float32)
    go = rng.normal(size=(b, m, c)).astype(np.float32)
    out = trilinear_scatter(
        jnp.asarray(u), jnp.asarray(go), r, interpret=True
    )
    assert out.shape == (b, r * r, r * c)
    a = _zy_plane_np(u, r)
    d1 = np.asarray(
        jnp.asarray(_xline_np(u[..., 2], r, c), jnp.bfloat16)
        * jnp.asarray(np.tile(go, (1, 1, r)), jnp.bfloat16),
        np.float32,
    )
    ref = np.einsum("bmz,bmn->bzn", a, d1, optimize=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)


def test_trilinear_gather(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import trilinear_gather

    b, m, r, c = 2, 520, 6, 4
    u = (rng.random((b, m, 3)) * (r + 1) - 1).astype(np.float32)
    mask = rng.random((b, m)) > 0.2
    u[~mask] = 0.0                            # _trilinear_u pins masked
    g2 = rng.normal(size=(b, r * r, r * c)).astype(np.float32)
    out = trilinear_gather(
        jnp.asarray(u), jnp.asarray(mask), jnp.asarray(g2), interpret=True
    )
    assert out.shape == (b, m, c)
    a = _zy_plane_np(u, r)
    g2b = np.asarray(jnp.asarray(g2, jnp.bfloat16), np.float32)
    t = np.einsum("bmz,bzn->bmn", a, g2b, optimize=True)
    tw = t * _xline_np(u[..., 2], r, c)
    ref = tw.reshape(b, m, r, c).sum(axis=2) * mask[..., None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)


def test_trilinear_roundtrip_matches_voxel_ops(rng):
    """End-to-end: the kernels inside devoxelize_trilinear(impl='matmul')
    agree with the XLA contraction path on the same inputs (forced via
    interpret by calling the kernels directly is covered above; here we
    check the ops/voxel XLA fallback math the kernels mirror)."""
    from pcseg_tpu.ops.voxel import devoxelize_trilinear

    b, m, r, c = 2, 128, 8, 3
    grid = jnp.asarray(rng.normal(size=(b, r, r, r, c)), jnp.float32)
    pts = jnp.asarray(rng.random((b, m, 3)) * 2 - 1, jnp.float32)
    mask = jnp.asarray(rng.random((b, m)) > 0.1)
    lo = jnp.full((b, 3), -1.0)
    scale = jnp.full((b, 3), r / 2.0)
    ref = devoxelize_trilinear(grid, pts, mask, lo, scale, impl="gather")
    out = devoxelize_trilinear(grid, pts, mask, lo, scale, impl="matmul")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_rowcol_scatter_matches_dense_sum(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import rowcol_scatter

    b, m, nrows, ncols, c = 2, 256, 5, 16, 3
    rows = rng.integers(0, nrows + 1, size=(b, m))        # incl. sentinel
    cols = rng.integers(0, ncols, size=(b, m))
    vals = rng.normal(size=(b, m, c)).astype(np.float32)
    out = rowcol_scatter(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
        nrows, ncols, interpret=True,
    )
    valsb = np.asarray(jnp.asarray(vals, jnp.bfloat16), np.float32)
    ref = np.zeros((b, nrows, ncols, c), np.float32)
    for bi in range(b):
        for p in range(m):
            if rows[bi, p] < nrows:
                ref[bi, rows[bi, p], cols[bi, p]] += valsb[bi, p]
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, nrows, ncols, c), ref,
        atol=1e-2, rtol=1e-2,
    )


def test_block_readout_custom_vjp_matches_autodiff(rng):
    """The TPU readout backward (rowcol_scatter contraction) must equal
    the XLA autodiff transpose of the gather, up to bf16 cotangent
    rounding (kernel in interpret mode on CPU)."""
    from pcseg_tpu.ops.block_sparse import _readout, _readout_raw

    b, ntiles, t3, c, m = 2, 6, 27, 4, 128
    site = jnp.asarray(rng.normal(size=(b, ntiles, t3, c)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, ntiles + 1, size=(b, m)), jnp.int32)
    intra = jnp.asarray(rng.integers(0, t3, size=(b, m)), jnp.int32)
    ct = jnp.asarray(rng.normal(size=(b, m, c)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(_readout(site, slot, intra)),
        np.asarray(_readout_raw(site, slot, intra)),
        atol=1e-6,
    )
    g_ref = jax.grad(lambda s: jnp.sum(_readout_raw(s, slot, intra) * ct))(
        site
    )
    g_pal = jax.grad(lambda s: jnp.sum(_readout(s, slot, intra) * ct))(site)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=1e-2, rtol=1e-2,
    )
