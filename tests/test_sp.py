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
