"""Sparse submanifold path: site extraction, conv semantics, model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.data.batching import pad_events
from pcseg_tpu.models.sparse_unet import SparseVoxelNet
from pcseg_tpu.ops.sparse import (
    gather_point_logits,
    sparse_from_grid,
    subm_conv,
    subm_conv_init,
)
from pcseg_tpu.ops.voxel import voxelize


def _grid(rng, b=2, m=200, r=16):
    points = rng.uniform(-5, 5, size=(b, m, 4)).astype(np.float32)
    masks = np.ones((b, m), bool)
    masks[:, -40:] = False
    points[~masks] = 0.0
    grid = voxelize(jnp.asarray(points), jnp.asarray(masks), r)
    return jnp.asarray(points), jnp.asarray(masks), grid


def test_sparse_from_grid_sites(rng):
    points, masks, grid = _grid(rng)
    sp = sparse_from_grid(grid, max_active=512)
    occ = int((np.asarray(grid.counts) > 0).sum())
    assert int(np.asarray(sp.site_mask).sum()) == occ
    # lookup maps each site's flat id back to its index
    r = sp.grid_size
    for b in range(2):
        sm = np.asarray(sp.site_mask[b])
        ijk = np.asarray(sp.ijk[b])[sm]
        flat = (ijk[:, 0] * r + ijk[:, 1]) * r + ijk[:, 2]
        lk = np.asarray(sp.lookup[b])
        np.testing.assert_array_equal(lk[flat], np.nonzero(sm)[0])


def test_subm_conv_identity_kernel(rng):
    """A kernel that is identity at the center offset and zero elsewhere
    must reproduce the input features (submanifold: sites unchanged)."""
    points, masks, grid = _grid(rng)
    sp = sparse_from_grid(grid, max_active=512)
    c = sp.feats.shape[-1]
    p = subm_conv_init(jax.random.key(0), c, c)
    kern = np.zeros((27, c, c), np.float32)
    kern[13] = np.eye(c)  # center offset of the 3x3x3 stencil
    p = {"kernel": jnp.asarray(kern), "bias": jnp.zeros((c,), jnp.float32)}
    out = subm_conv(p, sp)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sp.feats), atol=1e-6
    )


def test_subm_conv_matches_dense_conv(rng):
    """On a grid where ALL active sites matter, submanifold conv must equal
    a dense conv3d evaluated at active sites — when every neighbor that is
    occupied contributes and empty neighbors are zero (which is exactly
    dense conv on the occupancy-masked feature grid)."""
    points, masks, grid = _grid(rng, r=8)
    sp = sparse_from_grid(grid, max_active=512)
    cin, cout = sp.feats.shape[-1], 5
    p = subm_conv_init(jax.random.key(1), cin, cout)

    out_sparse = subm_conv(p, sp)

    # dense reference: conv3d over the (masked) dense feature grid
    dense = np.asarray(grid.features) * (np.asarray(grid.counts) > 0)[..., None]
    kern = np.asarray(p["kernel"]).reshape(3, 3, 3, cin, cout)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(dense),
        jnp.asarray(kern),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["bias"]
    y = np.asarray(y)

    r = sp.grid_size
    for b in range(2):
        sm = np.asarray(sp.site_mask[b])
        ijk = np.asarray(sp.ijk[b])[sm]
        got = np.asarray(out_sparse[b])[sm]
        want = y[b][ijk[:, 0], ijk[:, 1], ijk[:, 2]]
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gather_point_logits_roundtrip(rng):
    points, masks, grid = _grid(rng)
    sp = sparse_from_grid(grid, max_active=512)
    # site value = its own site index; every valid point must read the
    # value of its voxel's site
    a = sp.feats.shape[1]
    vals = jnp.broadcast_to(
        jnp.arange(a, dtype=jnp.float32)[None, :, None], (2, a, 1)
    )
    out = gather_point_logits(vals, sp, points, masks)
    assert np.isfinite(np.asarray(out)).all()
    m = np.asarray(masks)
    # every valid point's voxel is occupied (it contributed), so all reads hit
    got = np.asarray(out)[..., 0]
    assert (got[m] >= 0).all()


@pytest.mark.slow
@pytest.mark.slow
def test_sparse_model_forward_and_train(mesh8, small_events):
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    model = SparseVoxelNet(
        num_classes=4, grid_size=16, width=16, depth=3, max_active=1024
    )
    variables = model.init(jax.random.key(0))
    points, labels, masks = pad_events(small_events[:8], 512, 8)
    logits = model.apply(
        variables, jnp.asarray(points), train=False, mask=jnp.asarray(masks)
    )
    assert logits.shape == (8, 512, 4)
    assert np.isfinite(np.asarray(logits)).all()

    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh8, donate=False)
    batch = (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks))
    losses = []
    for i in range(20):
        state, metrics = step(state, batch, jnp.float32(3e-3), jax.random.key(i), jnp.ones((4,), jnp.float32))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[::4]


def test_dense_impl_matches_gather_impl(rng, small_events):
    """Masked-dense submanifold path == rulebook gather path (same params)."""
    import dataclasses

    points, labels, masks = pad_events(small_events[:4], 512, 4)
    mg = SparseVoxelNet(num_classes=4, grid_size=16, width=16, depth=3,
                        max_active=2048, impl="gather")
    md = dataclasses.replace(mg, impl="dense")
    v = mg.init(jax.random.key(2))
    lg = mg.apply(v, jnp.asarray(points), train=False, mask=jnp.asarray(masks))
    ld = md.apply(v, jnp.asarray(points), train=False, mask=jnp.asarray(masks))
    np.testing.assert_allclose(
        np.asarray(ld), np.asarray(lg), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
@pytest.mark.slow
def test_sparse_multilevel_unet(mesh8, small_events):
    """levels>1: pooled-occupancy encoder-decoder trains and masks hold."""
    model = SparseVoxelNet(
        num_classes=4, grid_size=16, width=8, depth=2, levels=2, impl="dense"
    )
    variables = model.init(jax.random.key(4))
    points, labels, masks = pad_events(small_events[:8], 512, 8)
    logits = model.apply(
        variables, jnp.asarray(points), train=False, mask=jnp.asarray(masks)
    )
    assert logits.shape == (8, 512, 4)
    assert np.isfinite(np.asarray(logits)).all()

    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh8, donate=False)
    batch = (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks))
    losses = []
    for i in range(15):
        state, metrics = step(state, batch, jnp.float32(3e-3), jax.random.key(i), jnp.ones((4,), jnp.float32))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses[::4]


def test_gather_multilevel_matches_dense(rng, small_events):
    """levels>1 gather hierarchy == masked-dense hierarchy (same params).

    Capacity is set above the occupancy at every level so the gather
    path's caps don't bite — the two formulations are then numerically
    identical at active sites (sparse_pool / sparse_down2x / sparse_up2x
    vs reduce_window + conv3d(stride=2) + conv3d_transpose)."""
    import dataclasses

    points, labels, masks = pad_events(small_events[:4], 512, 4)
    mg = SparseVoxelNet(num_classes=4, grid_size=16, width=16, depth=2,
                        levels=2, max_active=2048, impl="gather")
    md = dataclasses.replace(mg, impl="dense")
    v = mg.init(jax.random.key(2))
    lg = mg.apply(v, jnp.asarray(points), train=False, mask=jnp.asarray(masks))
    ld = md.apply(v, jnp.asarray(points), train=False, mask=jnp.asarray(masks))
    np.testing.assert_allclose(
        np.asarray(ld), np.asarray(lg), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
@pytest.mark.slow
def test_gather_multilevel_trains_and_counts_overflow(rng, small_events):
    """The gather U-Net trains; pooled-level capacity overflow is counted
    by overflow_counts and surfaced by the train step."""
    model = SparseVoxelNet(
        num_classes=4, grid_size=16, width=8, depth=2, levels=2,
        max_active=2048, impl="gather",
    )
    variables = model.init(jax.random.key(4))
    points, labels, masks = pad_events(small_events[:4], 512, 4)
    logits, aux = model.apply(
        variables, jnp.asarray(points), train=True, mask=jnp.asarray(masks)
    )
    assert logits.shape == (4, 512, 4)
    assert np.isfinite(np.asarray(logits)).all()
    assert (np.asarray(aux["__overflow__"]) == 0).all()

    # grads flow through pool/down/up
    def loss(p):
        lg, _ = model.apply(
            {"params": p}, jnp.asarray(points), train=True,
            mask=jnp.asarray(masks),
        )
        oh = jax.nn.one_hot(jnp.asarray(labels), 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(lg) * oh, -1))

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    assert float(jnp.abs(g["down1"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["up1"]["kernel"]).sum()) > 0

    # a tiny capacity makes every level overflow — counted, not silent
    tiny = SparseVoxelNet(
        num_classes=4, grid_size=16, width=8, depth=2, levels=2,
        max_active=8, impl="gather",
    )
    counts = tiny.overflow_counts(jnp.asarray(points), jnp.asarray(masks))
    assert (np.asarray(counts) > 0).all()
