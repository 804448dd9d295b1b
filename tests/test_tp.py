"""Tensor parallelism (Megatron column/row pairs on the wide layers):
sharded forward and train step must match the unsharded model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pcseg_tpu.data.batching import pad_events
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh
from pcseg_tpu.parallel.tp import (
    check_tp_shardable,
    create_tp_train_state,
    make_tp_forward,
    make_tp_train_step,
    tp_state_specs,
    tp_variables_specs,
)


@pytest.fixture(scope="module")
def tp_mesh():
    # pure tensor parallelism: 1 x 8 (data x model)
    return make_mesh(MeshSpec(data=1, model=8))


def _batch(small_events, b=2, bucket=512):
    points, labels, masks = pad_events(small_events[:b], bucket, b)
    return (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks))


def test_tp_eval_matches_unsharded(tp_mesh, small_events):
    model = PointNetSeg(num_classes=4)
    variables = model.init(jax.random.key(0))
    points, _, masks = _batch(small_events)

    ref = model.apply(variables, points, train=False, mask=masks)
    tp = make_tp_forward(model, tp_mesh, train=False)
    got = tp(variables, points, masks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_tp_train_stats_match_unsharded(tp_mesh, small_events):
    """Train-mode: channel-sharded BN statistics reassemble to the
    full-model statistics; row-parallel psums reproduce the wide matmuls."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    variables = model.init(jax.random.key(1))
    points, _, masks = _batch(small_events)

    ref_logits, ref_bn = model.apply(
        variables, points, train=True, mask=masks
    )
    tp = make_tp_forward(model, tp_mesh, train=True)
    got_logits, got_bn = tp(variables, points, masks)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-3
    )
    for a, b in zip(jax.tree.leaves(ref_bn), jax.tree.leaves(got_bn)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_tp_state_is_sharded(tp_mesh):
    """Params AND optimizer state of the wide layers are genuinely split
    over the model axis (1/T bytes per device)."""
    model = PointNetSeg(num_classes=4)
    tx = optax.adam(1e-3)
    state = create_tp_train_state(model, jax.random.key(0), tx, tp_mesh)

    k5 = state.params["conv5"]["kernel"]          # (128, 1024) col-sharded
    shard_shapes = {s.data.shape for s in k5.addressable_shards}
    assert shard_shapes == {(128, 128)}
    kg = state.params["global_feat"]["kernel"]    # (1024, 1024) row-sharded
    shard_shapes = {s.data.shape for s in kg.addressable_shards}
    assert shard_shapes == {(128, 1024)}
    # adam's mu mirrors the param sharding
    mu5 = jax.tree.leaves(
        jax.tree.map(lambda x: x, state.opt_state[0].mu["conv5"])
    )
    assert {s.data.shape for s in mu5[1].addressable_shards} == {(128, 128)}

    with pytest.raises(ValueError):
        check_tp_shardable(3)


def test_tp_train_step_matches_single_device(small_events):
    """A 2x4 (data x model) TP train step reproduces single-device params
    — grads for sharded layers stay local, replicated layers allreduce."""
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    model = PointNetSeg(num_classes=4, dropout=0.0)
    tx = optax.adam(1e-3)
    cw = jnp.asarray([0.3, 0.3, 2.8, 0.6])
    batch = _batch(small_events, b=4)

    mesh24 = make_mesh(MeshSpec(data=2, model=4))
    s_tp = create_tp_train_state(model, jax.random.key(0), tx, mesh24)
    tp_step = make_tp_train_step(
        model, tx, mesh24, sync_batchnorm=True, donate=False
    )
    n_tp, m_tp = tp_step(
        s_tp, batch, jnp.float32(1e-3), jax.random.key(9), cw
    )

    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])
    s_1 = create_train_state(model, jax.random.key(0), tx)
    step1 = make_train_step(
        model, tx, mesh1, sync_batchnorm=False, donate=False
    )
    n_1, m_1 = step1(s_1, batch, jnp.float32(1e-3), jax.random.key(9), cw)

    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-5
    )
    assert float(m_tp["correct"]) == float(m_1["correct"])
    flat_tp = jax.tree.leaves(n_tp.params)
    flat_1 = jax.tree.leaves(n_1.params)
    for a, b in zip(flat_tp, flat_1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6
        )
    for a, b in zip(
        jax.tree.leaves(n_tp.batch_stats), jax.tree.leaves(n_1.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_tp_specs_cover_every_leaf():
    """Every variables/state leaf gets a spec; the wide pairs shard, the
    narrow layers replicate."""
    from jax.sharding import PartitionSpec as P

    model = PointNetSeg(num_classes=4)
    shapes = jax.eval_shape(model.init, jax.random.key(0))
    vs = tp_variables_specs(shapes)
    assert jax.tree.structure(
        vs, is_leaf=lambda x: isinstance(x, P)
    ) == jax.tree.structure(shapes)
    assert vs["params"]["conv5"]["kernel"] == P(None, "model")
    assert vs["params"]["seg_conv2"]["kernel"] == P("model", None)
    assert vs["params"]["bn5"]["scale"] == P("model")
    assert vs["params"]["conv1"]["kernel"] == P()
    assert vs["batch_stats"]["bn_seg1"]["mean"] == P("model")

    ss = tp_state_specs(model, optax.adam(1e-3))
    assert ss.step == P()


def test_tp_rejects_mask_norm_and_pool(tp_mesh):
    """tp_apply has no masked-statistics path; the same config must not
    silently train a different objective than dp/sp."""
    import pytest

    from pcseg_tpu.parallel.tp import make_tp_forward, make_tp_train_step
    from pcseg_tpu.train.optim import make_optimizer

    model = PointNetSeg(num_classes=4, mask_norm_and_pool=True)
    with pytest.raises(ValueError, match="mask_norm_and_pool"):
        make_tp_forward(model, tp_mesh)
    with pytest.raises(ValueError, match="mask_norm_and_pool"):
        make_tp_train_step(model, make_optimizer(), tp_mesh)


def test_tp_eval_step_matches_single_device_and_stays_sharded(small_events):
    """VERDICT r3 item 6: eval under parallelism='tp' must keep the
    Megatron-sharded params sharded (no all-gather to replicated) and
    reproduce the single-device eval metrics (running-stats BN)."""
    from pcseg_tpu.parallel.tp import make_tp_eval_step
    from pcseg_tpu.train.steps import (
        create_train_state,
        make_eval_step,
    )

    model = PointNetSeg(num_classes=4, dropout=0.0)
    tx = optax.adam(1e-3)
    cw = jnp.asarray([0.3, 0.3, 2.8, 0.6])
    batch = _batch(small_events, b=4)
    # labels with pad sentinel so CE/confusion exercise masking
    pts, labels, masks = batch
    labels = jnp.where(masks, labels, -1)
    batch = (pts, labels, masks)

    mesh24 = make_mesh(MeshSpec(data=2, model=4))
    s_tp = create_tp_train_state(model, jax.random.key(0), tx, mesh24)
    ev_tp = make_tp_eval_step(model, mesh24, 4, tx)
    m_tp = ev_tp(s_tp, batch, cw)

    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])
    s_1 = create_train_state(model, jax.random.key(0), tx)
    ev_1 = make_eval_step(model, mesh1, 4)
    m_1 = ev_1(s_1, batch, cw)

    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-5
    )
    assert float(m_tp["correct"]) == float(m_1["correct"])
    assert float(m_tp["total"]) == float(m_1["total"])
    np.testing.assert_allclose(
        np.asarray(m_tp["confusion"]), np.asarray(m_1["confusion"])
    )

    # the sharded params must NOT be gathered: the eval program's
    # parameter inputs keep their model-axis sharding (the generic eval
    # step's replicated spec showed [{}, {}] here — the gather VERDICT
    # r3 item 6 flagged)
    import re

    hlo = ev_tp.lower(s_tp, batch, cw).as_text()
    shardings = re.findall(
        r"tensor<128x1024xf32> \{sdy.sharding = ([^>]*)>", hlo
    )
    assert shardings and all('{"model"}' in s for s in shardings), (
        f"conv5 kernel arrives gathered in eval: {shardings}"
    )
