"""Block-sparse submanifold conv: parity vs the masked-dense impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.ops.block_sparse import (
    BlockSparseVoxels,
    block_gather_point_logits,
    block_sparse_from_grid,
    block_subm_conv,
)
from pcseg_tpu.ops.sparse import subm_conv_dense, subm_conv_init
from pcseg_tpu.ops.voxel import voxelize


def _event_batch(rng, b=2, m=256, track=True):
    """LArTPC-ish: points along a few random line segments."""
    pts = []
    for _ in range(b):
        if track:
            k = 3
            seg = []
            for _ in range(k):
                a, d = rng.random(3), rng.normal(size=3)
                s = rng.random((m // k + 1, 1))
                seg.append(a + s * d * 0.5)
            p = np.concatenate(seg)[:m]
        else:
            p = rng.random((m, 3))
        e = rng.random((m, 1))
        pts.append(np.concatenate([p, e], axis=1))
    pts = jnp.asarray(np.stack(pts), jnp.float32)
    mask = jnp.asarray(rng.random((b, m)) < 0.95)
    return pts, mask


def _to_dense(bs: BlockSparseVoxels, vals):
    b, ntiles, t = vals.shape[0], vals.shape[1], bs.tile
    nt = bs.grid_size // t
    c = vals.shape[-1]

    def one(ijk, v, tm):
        v = jnp.where(tm[:, None, None, None, None], v, 0.0)
        dense = jnp.zeros((nt, nt, nt, t, t, t, c), v.dtype)
        dense = dense.at[ijk[:, 0], ijk[:, 1], ijk[:, 2]].add(v)
        return dense.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            bs.grid_size, bs.grid_size, bs.grid_size, c
        )

    return jax.vmap(one)(bs.tile_ijk, vals, bs.tile_mask)


def test_block_conv_matches_masked_dense():
    rng = np.random.default_rng(0)
    pts, mask = _event_batch(rng)
    grid = voxelize(pts, mask, 16)
    bs = block_sparse_from_grid(grid, max_tiles=48, tile=4)
    assert bool(jnp.all(jnp.sum(bs.tile_mask, 1) < 48)), "capacity too small"

    cin = grid.features.shape[-1]
    p1 = subm_conv_init(jax.random.key(0), cin, 8)
    p2 = subm_conv_init(jax.random.key(1), 8, 8)
    active = grid.counts > 0

    # layer 1
    yb = block_subm_conv(p1, bs)
    yd = subm_conv_dense(p1, grid.features, active)
    np.testing.assert_allclose(
        np.asarray(_to_dense(bs, yb)), np.asarray(yd), atol=1e-4, rtol=1e-4
    )
    # layer 2 stacked (submanifold: active set unchanged)
    yb2 = block_subm_conv(p2, bs, feats=yb)
    yd2 = subm_conv_dense(p2, yd, active)
    np.testing.assert_allclose(
        np.asarray(_to_dense(bs, yb2)), np.asarray(yd2), atol=1e-4, rtol=1e-4
    )


def test_block_capacity_truncation_drops_tiles():
    rng = np.random.default_rng(1)
    pts, mask = _event_batch(rng, track=False)   # spread occupancy
    grid = voxelize(pts, mask, 16)
    bs_small = block_sparse_from_grid(grid, max_tiles=4, tile=4)
    # truncated set still well-formed: lookup maps only kept tiles
    kept = np.asarray(jnp.sum(bs_small.tile_mask, axis=1))
    assert (kept == 4).all(), kept
    y = block_subm_conv(
        subm_conv_init(jax.random.key(0), grid.features.shape[-1], 4), bs_small
    )
    assert np.all(np.isfinite(np.asarray(y)))


def test_block_point_readout():
    rng = np.random.default_rng(2)
    pts, mask = _event_batch(rng)
    grid = voxelize(pts, mask, 16)
    bs = block_sparse_from_grid(grid, max_tiles=64, tile=4)
    vals = jnp.asarray(
        rng.normal(size=bs.feats.shape[:-1] + (5,)), jnp.float32
    )
    out = block_gather_point_logits(vals, bs, pts, mask)
    assert out.shape == pts.shape[:2] + (5,)
    dense = _to_dense(bs, vals)
    from pcseg_tpu.ops.voxel import voxel_indices

    flat, _, _ = voxel_indices(pts[..., :3], mask, 16)
    r3 = 16 ** 3
    ok = np.asarray(flat < r3) & np.asarray(mask)
    df = np.asarray(dense).reshape(2, r3, 5)
    want = np.where(
        ok[..., None],
        np.take_along_axis(
            df, np.minimum(np.asarray(flat), r3 - 1)[..., None], axis=1
        ),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_block_conv_gradients():
    rng = np.random.default_rng(3)
    pts, mask = _event_batch(rng)
    grid = voxelize(pts, mask, 16)
    bs = block_sparse_from_grid(grid, max_tiles=48, tile=4)
    p = subm_conv_init(jax.random.key(0), grid.features.shape[-1], 8)

    def loss(pp):
        return jnp.sum(block_subm_conv(pp, bs) ** 2)

    g = jax.grad(loss)(p)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.sum(jnp.abs(x))) > 0 for x in leaves)


def test_sparse_model_block_impl_matches_dense_impl():
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(5)
    pts, mask = _event_batch(rng)
    kw = dict(num_classes=4, grid_size=16, width=16, depth=2)
    m_d = SparseVoxelNet(**kw, impl="dense")
    m_b = SparseVoxelNet(**kw, impl="block", tile=4, max_tiles=64)
    v = m_d.init(jax.random.key(0))
    y_d = m_d.apply(v, pts, mask=mask)
    y_b = m_b.apply(v, pts, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_d), np.asarray(y_b), atol=1e-4, rtol=1e-4
    )


def test_sparse_model_block_impl_trains():
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(6)
    pts, mask = _event_batch(rng)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    m = SparseVoxelNet(num_classes=4, grid_size=16, width=16, depth=2,
                       impl="block", tile=4, max_tiles=64)
    v = m.init(jax.random.key(1))

    def loss(params):
        logits, _ = m.apply({"params": params, "batch_stats": {}},
                            pts, train=True, mask=mask)
        oh = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    l0, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l0))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_sparse_model_block_unet_matches_dense_unet():
    """levels=2 tile hierarchy (block_pool/down2x/up2x) vs the dense
    sparse-U-Net impl on shared weights."""
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(8)
    pts, mask = _event_batch(rng)
    kw = dict(num_classes=4, grid_size=16, width=16, depth=2, levels=2)
    m_d = SparseVoxelNet(**kw, impl="dense")
    m_b = SparseVoxelNet(**kw, impl="block", tile=4, max_tiles=64)
    v = m_d.init(jax.random.key(3))
    y_d = m_d.apply(v, pts, mask=mask)
    y_b = m_b.apply(v, pts, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_d), np.asarray(y_b), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_sparse_model_block_unet_trains():
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(9)
    pts, mask = _event_batch(rng)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    m = SparseVoxelNet(num_classes=4, grid_size=16, width=16, depth=2,
                       levels=2, impl="block", tile=4, max_tiles=64)
    v = m.init(jax.random.key(4))

    def loss(params):
        logits, _ = m.apply({"params": params, "batch_stats": {}},
                            pts, train=True, mask=mask)
        oh = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    l0, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l0))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # gradients reach the hierarchy params (down/up/l1 convs)
    assert float(jnp.sum(jnp.abs(g["down1"]["kernel"]))) > 0
    assert float(jnp.sum(jnp.abs(g["up1"]["kernel"]))) > 0


def test_octant_adjoints_match_autodiff_transpose():
    """The child->parent assembly (_octant_pack) and parent->child octant
    read (_octant_unpack) are mutual adjoints: their custom-VJP gathers
    must produce the exact autodiff-transpose gradients of the raw
    formulations."""
    from pcseg_tpu.ops.block_sparse import (
        _octant_pack,
        _octant_pack_raw,
        _octant_unpack,
        _octant_unpack_raw,
        _parent_rows,
        block_pool,
    )

    rng = np.random.default_rng(8)
    pts, mask = _event_batch(rng)
    grid = voxelize(pts, mask, 16)
    bs = block_sparse_from_grid(grid, max_tiles=48, tile=4)
    bsc, slots = block_pool(bs, 24)
    th = bs.tile // 2
    c = 8
    pslot, octant = _parent_rows(bsc, bs)

    ych = jnp.asarray(
        rng.normal(size=bs.feats.shape[:2] + (th, th, th, c)), jnp.float32
    )
    cot_c = jnp.asarray(
        rng.normal(size=slots.shape[:2] + (2 * th,) * 3 + (c,)), jnp.float32
    )

    def pack_custom(y):
        return jnp.sum(_octant_pack(y, slots, pslot, octant, th) * cot_c)

    def pack_raw(y):
        return jnp.sum(_octant_pack_raw(y, slots, th) * cot_c)

    np.testing.assert_allclose(
        float(pack_custom(ych)), float(pack_raw(ych)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(pack_custom)(ych)),
        np.asarray(jax.grad(pack_raw)(ych)),
        atol=1e-5, rtol=1e-5,
    )

    cf = jnp.asarray(
        rng.normal(size=slots.shape[:2] + (2 * th,) * 3 + (c,)), jnp.float32
    )
    cot_f = jnp.asarray(
        rng.normal(size=bs.feats.shape[:2] + (th, th, th, c)), jnp.float32
    )

    def unpack_custom(x):
        return jnp.sum(_octant_unpack(x, pslot, octant, slots, th) * cot_f)

    def unpack_raw(x):
        return jnp.sum(_octant_unpack_raw(x, pslot, octant, th) * cot_f)

    np.testing.assert_allclose(
        float(unpack_custom(cf)), float(unpack_raw(cf)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(unpack_custom)(cf)),
        np.asarray(jax.grad(unpack_raw)(cf)),
        atol=1e-5, rtol=1e-5,
    )


def test_fused_ln_model_branch_interpret_matches_xla():
    """fused_ln="interpret" runs the model's FUSED LN branch under the
    Pallas interpreter on CPU — covering the model-level plumbing
    (active.reshape alignment with y.reshape, eps/out_dtype forwarding,
    output reshape) that the backend gate otherwise leaves untested off
    TPU (r4 advisor finding). Values and grads must match fused_ln=False.
    """
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(11)
    pts, mask = _event_batch(rng)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    kw = dict(num_classes=4, grid_size=16, width=16, depth=2, levels=2,
              impl="block", tile=4, max_tiles=64)
    m_x = SparseVoxelNet(**kw, fused_ln=False)
    m_f = SparseVoxelNet(**kw, fused_ln="interpret")
    v = m_x.init(jax.random.key(7))
    y_x = m_x.apply(v, pts, mask=mask)
    y_f = m_f.apply(v, pts, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_x), np.asarray(y_f), atol=2e-2, rtol=2e-2
    )

    def loss(m):
        def f(params):
            logits, _ = m.apply({"params": params, "batch_stats": {}},
                                pts, train=True, mask=mask)
            oh = jax.nn.one_hot(labels, 4)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))
        return f

    lx, gx = jax.value_and_grad(loss(m_x))(v["params"])
    lf, gf = jax.value_and_grad(loss(m_f))(v["params"])
    np.testing.assert_allclose(float(lx), float(lf), rtol=2e-2)
    for ka, a in jax.tree_util.tree_leaves_with_path(gx):
        b = jax.tree_util.tree_leaves_with_path(gf)
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(dict((str(k), v) for k, v in b)[str(ka)]),
            atol=5e-2, rtol=5e-2,
            err_msg=f"grad mismatch at {ka}",
        )


def test_halo_onehot_matches_gather():
    """The one-hot MXU halo assembly must be bit-level-equivalent to the
    row-gather form: selection rows carry exactly one unit entry, so the
    matmul reproduces the gathered values exactly (f32 feats) and the
    autodiff transpose likewise. Also checked in bf16 (products of 1.0
    are exact in bf16 too)."""
    from pcseg_tpu.ops.block_sparse import (
        _gather_halo_slots,
        _neighbor_slots,
    )

    rng = np.random.default_rng(5)
    pts, mask = _event_batch(rng)
    grid = voxelize(pts, mask, 16)
    bs = block_sparse_from_grid(grid, max_tiles=48, tile=4)
    slot = _neighbor_slots(bs, +1)
    for dt in (jnp.float32, jnp.bfloat16):
        f = jnp.asarray(
            rng.normal(size=bs.feats.shape[:-1] + (8,))
        ).astype(dt)
        h_g = _gather_halo_slots(f, slot, 4, impl="gather")
        h_o = _gather_halo_slots(f, slot, 4, impl="onehot")
        np.testing.assert_array_equal(np.asarray(h_g), np.asarray(h_o))

    # gradients: the transpose of the one-hot contraction must equal the
    # gather's scatter-add transpose
    f32 = jnp.asarray(rng.normal(size=bs.feats.shape[:-1] + (8,)),
                      jnp.float32)
    ct = jnp.asarray(
        rng.normal(size=(f32.shape[0], f32.shape[1], 6, 6, 6, 8)),
        jnp.float32,
    )

    def scal(impl):
        return lambda x: jnp.sum(_gather_halo_slots(x, slot, 4, impl) * ct)

    g_g = jax.grad(scal("gather"))(f32)
    g_o = jax.grad(scal("onehot"))(f32)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_o),
                               atol=1e-5, rtol=1e-5)


def test_block_sparse_voxelize_matches_grid_route():
    """Direct tile-blocked voxelize == voxelize + block_sparse_from_grid
    (field by field, both impls)."""
    import jax.numpy as jnp

    from pcseg_tpu.ops.block_sparse import (
        block_sparse_from_grid,
        block_sparse_voxelize,
    )
    from pcseg_tpu.ops.voxel import voxelize

    rng = np.random.default_rng(5)
    pts, mask = _event_batch(rng)
    for impl in ("scatter", "matmul"):
        grid = voxelize(pts, mask, 16, impl=impl,
                        matmul_dtype=jnp.float32)
        want = block_sparse_from_grid(grid, max_tiles=48, tile=4)
        got, lo, scale = block_sparse_voxelize(
            pts, mask, 16, 48, 4, impl=impl, matmul_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got.tile_ijk),
                                      np.asarray(want.tile_ijk))
        np.testing.assert_allclose(np.asarray(got.feats),
                                   np.asarray(want.feats),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.active),
                                      np.asarray(want.active))
        np.testing.assert_array_equal(np.asarray(got.tile_mask),
                                      np.asarray(want.tile_mask))
        np.testing.assert_array_equal(np.asarray(got.lookup),
                                      np.asarray(want.lookup))
        np.testing.assert_array_equal(np.asarray(got.dropped),
                                      np.asarray(want.dropped))
        np.testing.assert_allclose(np.asarray(lo), np.asarray(grid.lo))
        np.testing.assert_allclose(np.asarray(scale),
                                   np.asarray(grid.scale))
