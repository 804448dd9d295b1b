"""Voxelize/devoxelize ops + VoxelUNet3d model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.data.batching import pad_events
from pcseg_tpu.models.voxel_unet import VoxelUNet3d
from pcseg_tpu.ops.voxel import (
    devoxelize_nearest,
    devoxelize_trilinear,
    voxel_indices,
    voxelize,
)


def _batch(rng, b=2, m=128, pad=32):
    points = rng.uniform(-10, 10, size=(b, m, 4)).astype(np.float32)
    masks = np.ones((b, m), bool)
    masks[:, m - pad:] = False
    points[~masks] = 0.0
    return jnp.asarray(points), jnp.asarray(masks)


def test_voxelize_mass_conservation(rng):
    """Every valid point lands in exactly one voxel; counts add up."""
    points, masks = _batch(rng)
    grid = voxelize(points, masks, grid_size=16)
    np.testing.assert_allclose(
        np.asarray(grid.counts).sum(axis=(1, 2, 3)),
        np.asarray(masks).sum(axis=1).astype(np.float32),
    )
    # occupancy channel mean is 1 wherever count > 0
    occ = np.asarray(grid.features[..., -1])
    cnt = np.asarray(grid.counts)
    np.testing.assert_allclose(occ[cnt > 0], 1.0)
    assert (occ[cnt == 0] == 0).all()


def test_voxelize_feature_mean(rng):
    """Feature scatter is a mean: single-point voxels carry the raw value."""
    pts = np.zeros((1, 4, 4), np.float32)
    pts[0, :, :3] = [[0, 0, 0], [9.9, 9.9, 9.9], [0, 0, 9.9], [0.1, 0, 0]]
    pts[0, :, 3] = [2.0, 4.0, 6.0, 10.0]
    masks = jnp.ones((1, 4), bool)
    grid = voxelize(jnp.asarray(pts), masks, grid_size=2)
    f = np.asarray(grid.features[0, ..., 0])
    c = np.asarray(grid.counts[0])
    # points 0 and 3 share voxel (0,0,0): mean (2+10)/2
    assert c[0, 0, 0] == 2 and f[0, 0, 0] == 6.0
    assert c[1, 1, 1] == 1 and f[1, 1, 1] == 4.0
    assert c[0, 0, 1] == 1 and f[0, 0, 1] == 6.0


def test_voxelize_padding_independent(rng):
    """More padding must not change the voxel grid (spill voxel works)."""
    points, masks = _batch(rng, m=128, pad=32)
    g1 = voxelize(points, masks, 8)
    # re-pad the same events to 256 points
    points2 = jnp.concatenate(
        [points, jnp.zeros((2, 128, 4), jnp.float32)], axis=1
    )
    masks2 = jnp.concatenate([masks, jnp.zeros((2, 128), bool)], axis=1)
    g2 = voxelize(points2, masks2, 8)
    np.testing.assert_allclose(
        np.asarray(g1.features), np.asarray(g2.features)
    )
    np.testing.assert_allclose(np.asarray(g1.lo), np.asarray(g2.lo))


def test_devoxelize_nearest_roundtrip(rng):
    """A point reads back the voxel it scattered into."""
    points, masks = _batch(rng)
    grid = voxelize(points, masks, 16)
    flat, _, _ = voxel_indices(points[..., :3], masks, 16)
    vals = devoxelize_nearest(grid.features, points, masks, grid.lo, grid.scale)
    # occupancy channel must be 1 for every valid point
    occ = np.asarray(vals[..., -1])
    np.testing.assert_allclose(occ[np.asarray(masks)], 1.0)
    assert (np.asarray(vals)[~np.asarray(masks)] == 0).all()


def test_devoxelize_trilinear_constant_field(rng):
    """Interpolating a constant grid returns that constant (partition of
    unity), away from boundary clamping effects."""
    b, m, r = 1, 64, 8
    points = rng.uniform(2.0, 8.0, size=(b, m, 4)).astype(np.float32)
    masks = jnp.ones((b, m), bool)
    # grid spanning the box: use voxelize to get lo/scale
    grid = voxelize(jnp.asarray(points), masks, r)
    const = jnp.full((b, r, r, r, 3), 5.0)
    out = devoxelize_trilinear(const, jnp.asarray(points), masks, grid.lo, grid.scale)
    np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-5)


def test_voxel_unet_forward(small_events):
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=8)
    variables = model.init(jax.random.key(0))
    points, labels, masks = pad_events(small_events[:2], 512, 2)
    logits = model.apply(
        variables, jnp.asarray(points), train=False, mask=jnp.asarray(masks)
    )
    assert logits.shape == (2, 512, 4)
    assert np.isfinite(np.asarray(logits)).all()
    # padded points get zero logits
    assert (np.asarray(logits)[~masks] == 0).all()


@pytest.mark.slow
def test_voxel_unet_trains(mesh8, small_events):
    import optax

    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    model = VoxelUNet3d(num_classes=4, grid_size=16, width=8)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh8, donate=False)
    points, labels, masks = pad_events(small_events[:8], 512, 8)
    batch = (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks))
    losses = []
    for i in range(20):
        state, metrics = step(state, batch, jnp.float32(3e-3), jax.random.key(i), jnp.ones((4,), jnp.float32))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[::4]


def test_devoxelize_backward_finite_with_dummy_rows(rng):
    """Regression: fully-masked rows must not produce NaN gradients
    (0 * NaN in the trilinear VJP poisoned params via the final short
    batch of an epoch)."""
    b, m, r = 2, 32, 8
    points = np.zeros((b, m, 4), np.float32)
    masks = np.zeros((b, m), bool)
    points[0] = rng.uniform(0, 4, size=(m, 4)).astype(np.float32)
    masks[0] = True  # row 1 fully masked
    pts, msk = jnp.asarray(points), jnp.asarray(masks)

    def f(g):
        grid = voxelize(pts, msk, r)
        out = devoxelize_trilinear(g, pts, msk, grid.lo, grid.scale)
        return jnp.sum(out)

    g = jnp.ones((b, r, r, r, 2), jnp.float32)
    grads = jax.grad(f)(g)
    assert np.isfinite(np.asarray(grads)).all()


def test_devoxelize_trilinear_custom_vjp_matches_reference():
    """The one-hot-contraction backward must equal XLA's scatter VJP."""
    from pcseg_tpu.ops.voxel import (
        _devoxelize_trilinear_ref,
        devoxelize_trilinear,
        voxelize,
    )

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(3, 64, 4)), jnp.float32)
    mask = jnp.asarray(rng.random((3, 64)) < 0.9)
    grid = voxelize(pts, mask, 8)
    g0 = jnp.asarray(rng.normal(size=(3, 8, 8, 8, 5)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(3, 64, 5)), jnp.float32)

    def loss(fn):
        def f(g):
            y = fn(g, pts, mask, grid.lo, grid.scale)
            return jnp.sum(y * t)
        return f

    d_ref = jax.grad(loss(_devoxelize_trilinear_ref))(g0)
    d_new = jax.grad(loss(devoxelize_trilinear))(g0)
    np.testing.assert_allclose(
        np.asarray(d_new), np.asarray(d_ref), atol=2e-2, rtol=2e-2
    )
    # f32 bwd_dtype: full-precision gradients (ADVICE r2)
    d_f32 = jax.grad(loss(
        lambda *a: devoxelize_trilinear(*a, bwd_dtype=jnp.float32)
    ))(g0)
    np.testing.assert_allclose(
        np.asarray(d_f32), np.asarray(d_ref), atol=1e-5, rtol=1e-5
    )
    # fwd unchanged
    y_ref = _devoxelize_trilinear_ref(g0, pts, mask, grid.lo, grid.scale)
    y_new = devoxelize_trilinear(g0, pts, mask, grid.lo, grid.scale)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref))


def test_voxelize_matmul_matches_scatter(rng):
    """One-hot MXU voxelizer == scatter path: exact counts, exact means
    in f32, bf16-rounded means in bf16 (VERDICT r2 #2). Covers the spill
    row (masked points) and the chunked point axis."""
    import pcseg_tpu.ops.voxel as vox

    points, masks = _batch(rng, b=2, m=128, pad=32)
    g_sc = vox.voxelize(points, masks, 8)
    g_mm = vox.voxelize(points, masks, 8, impl="matmul",
                        matmul_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(g_mm.counts), np.asarray(g_sc.counts)
    )
    np.testing.assert_allclose(
        np.asarray(g_mm.features), np.asarray(g_sc.features),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(g_mm.lo), np.asarray(g_sc.lo))
    # bf16 operands: counts still exact, features rounded
    g_bf = vox.voxelize(points, masks, 8, impl="matmul")
    np.testing.assert_array_equal(
        np.asarray(g_bf.counts), np.asarray(g_sc.counts)
    )
    np.testing.assert_allclose(
        np.asarray(g_bf.features), np.asarray(g_sc.features),
        atol=2e-2, rtol=2e-2,
    )


def test_voxelize_auto_dispatch(rng):
    """impl='auto' picks matmul below the R^3*(C+1) crossover and
    scatter above it; both must agree with the explicit impls."""
    import pcseg_tpu.ops.voxel as vox

    points, masks = _batch(rng, b=2, m=64, pad=16)
    # R=8, C=2: tiny grid -> matmul branch (bf16 default dtype)
    g_auto = vox.voxelize(points, masks, 8, impl="auto")
    g_mm = vox.voxelize(points, masks, 8, impl="matmul")
    np.testing.assert_array_equal(
        np.asarray(g_auto.features), np.asarray(g_mm.features)
    )
    # R=128, C=2: 128^3*3 > 4e6 -> scatter branch (exact f32 sums)
    g_auto = vox.voxelize(points, masks, 128, impl="auto")
    g_sc = vox.voxelize(points, masks, 128, impl="scatter")
    np.testing.assert_array_equal(
        np.asarray(g_auto.features), np.asarray(g_sc.features)
    )


def test_voxelize_matmul_chunked_matches(monkeypatch):
    import pcseg_tpu.ops.voxel as vox

    rng = np.random.default_rng(3)
    points, masks = _batch(rng, b=2, m=100, pad=20)
    g_full = vox.voxelize(points, masks, 8, impl="matmul",
                          matmul_dtype=jnp.float32)
    monkeypatch.setattr(vox, "_DEVOX_BWD_BUDGET_BYTES", 2 * 64 * 4 * 7)
    g_chunk = vox.voxelize(points, masks, 8, impl="matmul",
                           matmul_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(g_chunk.counts), np.asarray(g_full.counts)
    )
    np.testing.assert_allclose(
        np.asarray(g_chunk.features), np.asarray(g_full.features),
        atol=1e-5, rtol=1e-5,
    )


def test_devoxelize_backward_chunked_matches(monkeypatch):
    """Shrinking the HBM budget forces the point-chunked backward; the
    accumulated gradient must equal the single-shot contraction."""
    import pcseg_tpu.ops.voxel as vox

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(2, 50, 4)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 50)) < 0.9)
    grid = vox.voxelize(pts, mask, 8)
    g0 = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 50, 3)), jnp.float32)

    def f(g):
        y = vox.devoxelize_trilinear(
            g, pts, mask, grid.lo, grid.scale, bwd_dtype=jnp.float32
        )
        return jnp.sum(y * t)

    d_single = jax.grad(f)(g0)
    # row_bytes = 2*64*4 = 512; budget 512*7 -> chunk 7 (50 = 7*7 + 1)
    monkeypatch.setattr(vox, "_DEVOX_BWD_BUDGET_BYTES", 512 * 7)
    d_chunked = jax.grad(f)(g0)
    np.testing.assert_allclose(
        np.asarray(d_chunked), np.asarray(d_single), atol=1e-5, rtol=1e-5
    )


def test_voxel_unet_matmul_voxelizer_matches(small_events):
    """voxelize_impl='matmul' (f32) must reproduce the scatter path's
    logits through the whole model."""
    import dataclasses

    m_sc = VoxelUNet3d(num_classes=4, grid_size=16, width=8,
                       voxelize_impl="scatter")
    m_mm = dataclasses.replace(m_sc, voxelize_impl="matmul")
    variables = m_sc.init(jax.random.key(0))
    points, labels, masks = pad_events(small_events[:2], 512, 2)
    pts, msk = jnp.asarray(points), jnp.asarray(masks)
    l_sc = m_sc.apply(variables, pts, train=False, mask=msk)
    l_mm = m_mm.apply(variables, pts, train=False, mask=msk)
    np.testing.assert_allclose(
        np.asarray(l_mm), np.asarray(l_sc), atol=1e-4, rtol=1e-4
    )


def test_devoxelize_matmul_forward_matches(monkeypatch):
    """impl='matmul' (f32 operands) == the gather forward, incl. the
    chunked path and gradients (shared backward)."""
    from pcseg_tpu.ops import voxel as vox

    rng = np.random.default_rng(13)
    pts = jnp.asarray(rng.normal(size=(2, 50, 4)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 50)) < 0.9)
    grid = vox.voxelize(pts, mask, 8)
    g0 = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 5)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 50, 5)), jnp.float32)

    def run(impl):
        def f(g):
            y = vox.devoxelize_trilinear(
                g, pts, mask, grid.lo, grid.scale,
                bwd_dtype=jnp.float32, impl=impl,
            )
            return jnp.sum(y * t), y
        return jax.value_and_grad(f, has_aux=True)(g0)

    (v_g, y_g), d_g = run("gather")
    (v_m, y_m), d_m = run("matmul")
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_g),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_g),
                               atol=1e-5, rtol=1e-5)
    # chunked forward (row_bytes = 2*64*4 = 512; chunk 7, 50 = 7*7+1)
    monkeypatch.setattr(vox, "_DEVOX_BWD_BUDGET_BYTES", 512 * 7)
    (v_c, y_c), d_c = run("matmul")
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_g),
                               atol=1e-5, rtol=1e-5)
    # auto resolves to matmul at R=8 and to gather at huge R^3*C
    assert vox.devoxelize_trilinear(
        g0, pts, mask, grid.lo, grid.scale, impl="auto"
    ).shape == y_g.shape


def test_voxel_unet_devox_matmul_matches(small_events):
    """devox_impl='matmul' reproduces the gather path's logits through
    the whole model (f32 compute keeps the contraction f32)."""
    import dataclasses

    m_g = VoxelUNet3d(num_classes=4, grid_size=16, width=8,
                      devox_impl="gather")
    m_m = dataclasses.replace(m_g, devox_impl="matmul")
    variables = m_g.init(jax.random.key(0))
    points, labels, masks = pad_events(small_events[:2], 512, 2)
    pts, msk = jnp.asarray(points), jnp.asarray(masks)
    l_g = m_g.apply(variables, pts, train=False, mask=msk)
    l_m = m_m.apply(variables, pts, train=False, mask=msk)
    np.testing.assert_allclose(
        np.asarray(l_m), np.asarray(l_g), atol=1e-4, rtol=1e-4
    )


def test_voxelize_packed_matches_pad_pack(rng):
    """voxelize_packed == pack_grid(pad(voxelize(impl='matmul') means
    cast to bf16)) bit-for-bit — the packed fast path moves the same
    f32-divided, bf16-cast means through 0/1 placement matmuls."""
    from pcseg_tpu.ops.pallas.conv3d_block import pack_grid
    from pcseg_tpu.ops.voxel import voxelize_packed

    points, masks = _batch(rng, b=2, m=128, pad=32)
    r, w0 = 16, 16
    grid = voxelize(points, masks, r, impl="matmul")
    cin = grid.features.shape[-1]
    ref = jnp.pad(
        grid.features.astype(jnp.bfloat16),
        ((0, 0),) * 4 + ((0, w0 - cin),),
    )
    ref_p, meta = pack_grid(ref)
    xp, lo, scale = voxelize_packed(points, masks, r, w0)
    assert xp.shape == ref_p.shape and xp.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(ref_p))
    np.testing.assert_allclose(np.asarray(lo), np.asarray(grid.lo))
    np.testing.assert_allclose(np.asarray(scale), np.asarray(grid.scale))


def test_devoxelize_grid2_matches_5d(rng):
    """devoxelize_trilinear_grid2 on grid.reshape(B, R*R, R*C) matches
    the 5-D matmul formulation — values AND the grid cotangent."""
    from pcseg_tpu.ops.voxel import devoxelize_trilinear_grid2

    points, masks = _batch(rng, b=2, m=128, pad=32)
    r, c = 16, 4
    grid = voxelize(points, masks, r)
    gf = jnp.asarray(
        rng.normal(size=(2, r, r, r, c)), jnp.float32
    )
    grid2 = gf.reshape(2, r * r, r * c)

    def f5(g):
        out = devoxelize_trilinear(
            g, points, masks, grid.lo, grid.scale,
            bwd_dtype=jnp.bfloat16, impl="matmul",
        )
        return jnp.sum(out * out), out

    def f2(g):
        out = devoxelize_trilinear_grid2(
            g, points, masks, grid.lo, grid.scale,
            bwd_dtype=jnp.bfloat16,
        )
        return jnp.sum(out * out), out

    (l5, o5), g5 = jax.value_and_grad(f5, has_aux=True)(gf)
    (l2, o2), g2 = jax.value_and_grad(f2, has_aux=True)(grid2)
    np.testing.assert_allclose(np.asarray(o5), np.asarray(o2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g5.reshape(2, r * r, r * c)), np.asarray(g2),
        atol=1e-5, rtol=1e-5,
    )


def test_devoxelize_grid2_gather_impl(rng):
    """impl='gather' on grid2 (the fused core's 128^3 path) matches the
    5-D gather composition exactly in the forward, and shares the
    contraction backward."""
    from pcseg_tpu.ops.voxel import devoxelize_trilinear_grid2

    points, masks = _batch(rng, b=2, m=128, pad=32)
    r, c = 16, 4
    grid = voxelize(points, masks, r)
    gf = jnp.asarray(rng.normal(size=(2, r, r, r, c)), jnp.float32)
    grid2 = gf.reshape(2, r * r, r * c)

    ref = devoxelize_trilinear(
        gf, points, masks, grid.lo, grid.scale, impl="gather"
    )

    def f2(g):
        out = devoxelize_trilinear_grid2(
            g, points, masks, grid.lo, grid.scale,
            bwd_dtype=jnp.bfloat16, impl="gather",
        )
        return jnp.sum(out * out), out

    def f2m(g):
        out = devoxelize_trilinear_grid2(
            g, points, masks, grid.lo, grid.scale,
            bwd_dtype=jnp.bfloat16, impl="matmul",
        )
        return jnp.sum(out * out), out

    (_, o2), g2 = jax.value_and_grad(f2, has_aux=True)(grid2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    # backward is the shared contraction; cotangents differ only through
    # the forward value entering sum(out*out)
    (_, o2m), g2m = jax.value_and_grad(f2m, has_aux=True)(grid2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2m),
                               atol=2e-2, rtol=2e-2)


def test_head1x1_grid2_matches_packed(rng):
    """head1x1_grid2 == head1x1_packed reshaped to (B, R*R, R*NC)."""
    from pcseg_tpu.ops.pallas.conv3d_block import (
        head1x1_grid2,
        head1x1_packed,
        pack_grid,
    )

    b, r, c, nc = 2, 16, 16, 4
    x = jnp.asarray(rng.normal(size=(b, r, r, r, c)), jnp.bfloat16)
    xp, meta = pack_grid(x)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, c, nc)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nc,)), jnp.float32)
    y5 = head1x1_packed(xp, w, bias, meta, nc)
    y2 = head1x1_grid2(xp, w, bias, meta, nc)
    np.testing.assert_allclose(
        np.asarray(y5.reshape(b, r * r, r * nc)), np.asarray(y2),
        atol=1e-5, rtol=1e-5,
    )


def test_voxelize_packed_rejects_channels_over_stem_width(rng):
    """Channel counts above the packed stem width must fail loudly —
    the lane placement would sum adjacent x-voxels' features otherwise."""
    import pytest

    from pcseg_tpu.ops.voxel import voxelize_packed

    points = jnp.asarray(rng.normal(size=(1, 64, 20)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    # 17 feature channels + occupancy = 18 > w0=16
    with pytest.raises(ValueError, match="exceed the packed stem width"):
        voxelize_packed(points, mask, grid_size=32, w0=16)
