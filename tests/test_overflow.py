"""Sparse capacity overflow is surfaced, not silent (VERDICT r2 #3).

Occupied sites/tiles beyond the static capacity are dropped and their
points read zero logits — these tests pin that every layer reports the
drop: the extraction ops, train/eval step metrics, and the Predictor.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.models.sparse_unet import SparseVoxelNet
from pcseg_tpu.ops.block_sparse import block_pool, block_sparse_from_grid
from pcseg_tpu.ops.sparse import sparse_from_grid
from pcseg_tpu.ops.voxel import voxelize


def _dense_batch(rng, b=2, m=300, r=16):
    """Points spread over the box -> many occupied voxels/tiles."""
    points = rng.uniform(-5, 5, size=(b, m, 4)).astype(np.float32)
    masks = np.ones((b, m), bool)
    return jnp.asarray(points), jnp.asarray(masks)


def test_sparse_from_grid_reports_dropped(rng):
    points, masks = _dense_batch(rng)
    grid = voxelize(points, masks, 16)
    occ = (np.asarray(grid.counts) > 0).sum(axis=(1, 2, 3))
    cap = int(occ.min()) - 5
    sp = sparse_from_grid(grid, max_active=cap)
    np.testing.assert_array_equal(
        np.asarray(sp.dropped), np.maximum(occ - cap, 0)
    )
    # ample capacity -> zero dropped
    sp_ok = sparse_from_grid(grid, max_active=int(occ.max()) + 8)
    assert (np.asarray(sp_ok.dropped) == 0).all()


def test_block_sparse_from_grid_reports_dropped(rng):
    points, masks = _dense_batch(rng)
    grid = voxelize(points, masks, 16)
    occ_t = (
        (np.asarray(grid.counts) > 0)
        .reshape(2, 4, 4, 4, 4, 4, 4)
        .transpose(0, 1, 3, 5, 2, 4, 6)
        .reshape(2, 64, -1)
        .any(axis=-1)
        .sum(axis=-1)
    )
    cap = int(occ_t.min()) - 2
    bs = block_sparse_from_grid(grid, max_tiles=cap, tile=4)
    np.testing.assert_array_equal(
        np.asarray(bs.dropped), np.maximum(occ_t - cap, 0)
    )
    # block_pool counts its own level's drops
    bs_full = block_sparse_from_grid(grid, max_tiles=64, tile=4)
    bsc, _ = block_pool(bs_full, max_tiles=2)
    assert (np.asarray(bsc.dropped) > 0).any()


def test_overflow_counts_matches_extraction(rng):
    points, masks = _dense_batch(rng)
    for impl, kw in [
        ("gather", dict(max_active=20)),
        ("block", dict(max_tiles=3, tile=4)),
        ("dense", {}),
    ]:
        model = SparseVoxelNet(
            num_classes=4, grid_size=16, width=8, depth=1, impl=impl, **kw
        )
        got = np.asarray(model.overflow_counts(points, masks))
        if impl == "dense":
            assert (got == 0).all()
            continue
        grid = voxelize(points, masks, 16)
        if impl == "gather":
            want = np.asarray(sparse_from_grid(grid, 20).dropped)
        else:
            want = np.asarray(
                block_sparse_from_grid(grid, 3, tile=4).dropped
            )
        assert (got > 0).all()
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl,kw", [
    ("gather", dict(max_active=20)),
    ("block", dict(max_tiles=3, tile=4)),
])
def test_train_and_eval_steps_report_dropped(mesh8, rng, impl, kw):
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    model = SparseVoxelNet(
        num_classes=4, grid_size=16, width=8, depth=1, impl=impl, **kw
    )
    points, masks = _dense_batch(rng, b=8)
    labels = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, size=(8, 300)), jnp.int32
    )
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh8, donate=False)
    cw = jnp.ones((4,), jnp.float32)
    state, metrics = step(
        state, (points, labels, masks), jnp.float32(1e-3),
        jax.random.key(1), cw,
    )
    assert int(metrics["dropped"]) > 0
    # batch_stats stays clean (the aux key must not leak into the state)
    assert state.batch_stats == {}

    eval_step = make_eval_step(model, mesh8, 4)
    emetrics = eval_step(state, (points, labels, masks), cw)
    assert int(emetrics["dropped"]) == int(metrics["dropped"])


def test_predictor_warns_and_strict_raises(rng):
    from pcseg_tpu.infer import Predictor

    model = SparseVoxelNet(
        num_classes=4, grid_size=16, width=8, depth=1, impl="block",
        max_tiles=3, tile=4,
    )
    variables = model.init(jax.random.key(0))
    event = np.asarray(
        rng.uniform(-5, 5, size=(300, 4)), np.float32
    )
    pred = Predictor(variables, 4, model=model, fold=False)
    with pytest.warns(UserWarning, match="capacity overflow"):
        pred.predict(event)
    strict = Predictor(
        variables, 4, model=model, fold=False, strict_capacity=True
    )
    with pytest.raises(RuntimeError, match="capacity overflow"):
        strict.predict(event)
    # ample capacity: no warning
    ok_model = dataclasses.replace(model, max_tiles=64)
    ok = Predictor(
        model.init(jax.random.key(0)), 4, model=ok_model, fold=False,
        strict_capacity=True,
    )
    ok.predict(event)


def test_apply_return_overflow_matches_counts(rng):
    """Eval-mode apply(return_overflow=True) returns the same per-event
    dropped counts as the standalone overflow_counts scan (which eval
    metrics/serving no longer call — the forward carries the counts)."""
    points, masks = _dense_batch(rng)
    for impl in ("block", "gather", "dense"):
        model = SparseVoxelNet(
            num_classes=4, grid_size=16, width=8, depth=1, impl=impl,
            max_tiles=3, tile=4, max_active=64,
        )
        variables = model.init(jax.random.key(0))
        logits, dropped = model.apply(
            variables, points, mask=masks, return_overflow=True
        )
        plain = model.apply(variables, points, mask=masks)
        np.testing.assert_array_equal(np.asarray(logits), np.asarray(plain))
        np.testing.assert_array_equal(
            np.asarray(dropped),
            np.asarray(model.overflow_counts(points, masks)),
        )
