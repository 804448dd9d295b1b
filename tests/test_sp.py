"""Point-axis sharding (sequence-parallel analog): numerics must match
the unsharded forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.data.batching import pad_events
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh
from pcseg_tpu.parallel.sp import make_sp_forward


@pytest.fixture(scope="module")
def sp_mesh():
    # pure point-axis sharding: 1 x 8 (data x model)
    return make_mesh(MeshSpec(data=1, model=8))


def _batch(small_events, b=2, bucket=512):
    points, labels, masks = pad_events(small_events[:b], bucket, b)
    return jnp.asarray(points), jnp.asarray(masks)


def test_sp_eval_matches_unsharded(sp_mesh, small_events):
    model = PointNetSeg(num_classes=4)
    variables = model.init(jax.random.key(0))
    points, masks = _batch(small_events)

    ref = model.apply(variables, points, train=False, mask=masks)
    sp = make_sp_forward(model, sp_mesh, train=False)
    got = sp(variables, points, masks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_sp_train_stats_match_unsharded(sp_mesh, small_events):
    """Train-mode: psum'd BN stats over point shards == full-batch stats;
    pmax global pool == full max."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    variables = model.init(jax.random.key(1))
    points, masks = _batch(small_events)

    ref_logits, ref_bn = model.apply(
        variables, points, train=True, mask=masks
    )
    sp = make_sp_forward(model, sp_mesh, train=True)
    got_logits, got_bn = sp(variables, points, masks)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-3
    )
    for a, b in zip(jax.tree.leaves(ref_bn), jax.tree.leaves(got_bn)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_dp_times_sp_mesh(small_events):
    """DP x SP combined (2 x 4 mesh): full-batch-stat train forward equals
    the unsharded forward."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    variables = model.init(jax.random.key(3))
    points, masks = _batch(small_events, b=4)
    mesh = make_mesh(MeshSpec(data=2, model=4))

    ref_logits, ref_bn = model.apply(variables, points, train=True, mask=masks)
    sp = make_sp_forward(model, mesh, train=True)
    got_logits, got_bn = sp(variables, points, masks)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-3
    )
    for a, b in zip(jax.tree.leaves(ref_bn), jax.tree.leaves(got_bn)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_sp_train_step_matches_single_device(small_events):
    """A 2x4 (data x model) SP train step reproduces single-device params
    — the SP analog of test_dp8_matches_single_device."""
    import optax

    from pcseg_tpu.parallel.sp import make_sp_train_step
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    model = PointNetSeg(num_classes=4, dropout=0.0)
    tx = optax.identity()  # param delta IS the gradient
    cw = jnp.asarray([0.3, 0.3, 2.8, 0.6])
    points, labels, masks = pad_events(small_events[:4], 512, 4)
    batch = (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks))

    mesh24 = make_mesh(MeshSpec(data=2, model=4))
    s_sp = create_train_state(model, jax.random.key(0), tx)
    sp_step = make_sp_train_step(
        model, tx, mesh24, sync_batchnorm=True, donate=False
    )
    n_sp, m_sp = sp_step(
        s_sp, batch, jnp.float32(1e-3), jax.random.key(9), cw
    )

    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])
    s_1 = create_train_state(model, jax.random.key(0), tx)
    step1 = make_train_step(
        model, tx, mesh1, sync_batchnorm=False, donate=False
    )
    n_1, m_1 = step1(s_1, batch, jnp.float32(1e-3), jax.random.key(9), cw)

    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_1["loss"]), rtol=1e-5
    )
    assert float(m_sp["correct"]) == float(m_1["correct"])
    for a, b in zip(jax.tree.leaves(n_sp.params), jax.tree.leaves(n_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )
    for a, b in zip(
        jax.tree.leaves(n_sp.batch_stats), jax.tree.leaves(n_1.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
