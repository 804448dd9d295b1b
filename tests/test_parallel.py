"""Data-parallel correctness: the mesh must be numerics-invisible.

A DP step over 8 devices must produce the same new params as the same
batch on a 1-device mesh — the global weighted-CE normalization (psum of
numerator/denominator, not mean-of-means) is what makes this exact even
with uneven valid-point counts per shard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.data.batching import pad_events
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh
from pcseg_tpu.train.optim import make_optimizer
from pcseg_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _uneven_batch(small_events, b=8, bucket=512):
    # deliberately uneven: different event sizes per row
    points, labels, masks = pad_events(small_events[:b], bucket, b)
    return jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks)


def test_dp8_matches_single_device(mesh8, small_events):
    """With sync-BN, an 8-shard step is bit-comparable to 1 device.

    (With per-replica BN — the DataParallel default — train-mode
    activations legitimately depend on the device count, exactly like the
    reference under DataParallel; that behavior is covered in
    test_sync_batchnorm_matches_global_stats.)
    """
    import optax

    model = PointNetSeg(num_classes=4, dropout=0.0)  # dropout off: keys
    # fold in axis_index, so masks differ across replica layouts by design.
    # Identity "optimizer": new_params = params - lr * grad, so the param
    # delta IS the gradient — Adam's sign-like first step would amplify
    # reduction-order noise in near-zero grads into +/-lr flips.
    tx = optax.identity()
    cw = jnp.asarray([0.3, 0.3, 2.8, 0.6])
    batch = _uneven_batch(small_events)

    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])

    outs = {}
    for name, mesh in [("dp8", mesh8), ("dp1", mesh1)]:
        state = create_train_state(model, jax.random.key(0), tx)
        step = make_train_step(
            model, tx, mesh, sync_batchnorm=True, donate=False
        )
        new_state, metrics = step(
            state, batch, jnp.float32(1e-3), jax.random.key(9), cw
        )
        outs[name] = (new_state, metrics)

    m8, m1 = outs["dp8"][1], outs["dp1"][1]
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m8["correct"]) == float(m1["correct"])
    assert float(m8["total"]) == float(m1["total"])

    # param deltas = -lr * grads: gradients must agree across meshes
    leaves8 = jax.tree.leaves(outs["dp8"][0].params)
    leaves1 = jax.tree.leaves(outs["dp1"][0].params)
    for a, b in zip(leaves8, leaves1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_eval_dp8_matches_single_device(mesh8, small_events):
    model = PointNetSeg(num_classes=4)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    batch = _uneven_batch(small_events)
    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])

    ones = jnp.ones((4,), jnp.float32)
    e8 = make_eval_step(model, mesh8, 4)(state, batch, ones)
    e1 = make_eval_step(model, mesh1, 4)(state, batch, ones)
    np.testing.assert_allclose(float(e8["loss"]), float(e1["loss"]), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(e8["confusion"]), np.asarray(e1["confusion"])
    )


@pytest.mark.slow
def test_sync_batchnorm_matches_global_stats(mesh8, small_events):
    """sync-BN on 8 shards == per-replica BN on 1 device (same global batch)."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    tx = make_optimizer()
    batch = _uneven_batch(small_events)
    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])

    s8 = create_train_state(model, jax.random.key(0), tx)
    s1 = create_train_state(model, jax.random.key(0), tx)
    step8 = make_train_step(model, tx, mesh8, sync_batchnorm=True, donate=False)
    step1 = make_train_step(model, tx, mesh1, sync_batchnorm=False, donate=False)
    ones = jnp.ones((4,), jnp.float32)
    n8, _ = step8(s8, batch, jnp.float32(1e-3), jax.random.key(5), ones)
    n1, _ = step1(s1, batch, jnp.float32(1e-3), jax.random.key(5), ones)
    for a, b in zip(
        jax.tree.leaves(n8.batch_stats), jax.tree.leaves(n1.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_fully_padded_rows_are_inert_to_loss(mesh8, small_events):
    """Short final batches are padded with all-masked rows; the loss and
    metrics must not see them (grad path unaffected)."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    tx = make_optimizer()
    cw = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    points, labels, masks = pad_events(small_events[:8], 512, 8)
    # second batch: same 8 events but declared as batch of 16 w/ 8 dummy rows
    points2, labels2, masks2 = pad_events(small_events[:8], 512, 16)

    state = create_train_state(model, jax.random.key(0), tx)
    # sync-BN so statistics are layout-independent: with per-replica BN
    # the row placement itself changes local stats (as with DataParallel).
    step = make_train_step(model, tx, mesh8, sync_batchnorm=True, donate=False)
    _, m_a = step(
        state,
        (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks)),
        jnp.float32(1e-3),
        jax.random.key(0),
        cw,
    )
    state2 = create_train_state(model, jax.random.key(0), tx)
    _, m_b = step(
        state2,
        (jnp.asarray(points2), jnp.asarray(labels2), jnp.asarray(masks2)),
        jnp.float32(1e-3),
        jax.random.key(0),
        cw,
    )
    # loss/metrics identical: padded rows carry zero loss weight
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
    )
    assert float(m_a["total"]) == float(m_b["total"])


@pytest.mark.slow
def test_scan_train_steps_matches_loop(mesh8, small_events):
    """K steps in one scanned dispatch == K per-step dispatches."""
    from pcseg_tpu.train.steps import make_scan_train_steps

    model = PointNetSeg(num_classes=4, dropout=0.0)
    tx = make_optimizer()
    K = 3
    points, labels, masks = _uneven_batch(small_events)
    pts = jnp.stack([points] * K)
    labs = jnp.stack([labels] * K)
    msks = jnp.stack([masks] * K)
    keys = jax.random.split(jax.random.key(0), K)
    cw = jnp.ones((4,), jnp.float32)
    lr = jnp.float32(1e-3)

    s1 = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh8, donate=False)
    for i in range(K):
        s1, m1 = step(s1, (points, labels, masks), lr, keys[i], cw)

    s2 = create_train_state(model, jax.random.key(0), tx)
    run = make_scan_train_steps(model, tx, mesh8)
    s2, ms = run(s2, (pts, labs, msks), lr, keys, cw)

    np.testing.assert_allclose(
        float(m1["loss"]), float(ms["loss"][-1]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )


def test_per_replica_bn_keeps_replica0_stats(mesh8, small_events):
    """DataParallel semantics: with per-replica BN the canonical running
    stats are REPLICA 0's update (torch keeps only the original module's
    buffers) — not an average of per-shard variances, which would drop the
    between-shard mean component."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    import optax

    tx = optax.identity()
    batch = _uneven_batch(small_events)
    cw = jnp.ones((4,), jnp.float32)
    lr = jnp.float32(0.0)

    s8 = create_train_state(model, jax.random.key(0), tx)
    step8 = make_train_step(
        model, tx, mesh8, sync_batchnorm=False, donate=False
    )
    n8, _ = step8(s8, batch, lr, jax.random.key(5), cw)

    # replica 0 of the 8-way mesh sees exactly batch row 0
    mesh1 = make_mesh(MeshSpec(data=1), devices=jax.devices()[:1])
    shard0 = tuple(jnp.asarray(a[:1]) for a in batch)
    s1 = create_train_state(model, jax.random.key(0), tx)
    step1 = make_train_step(
        model, tx, mesh1, sync_batchnorm=False, donate=False
    )
    n1, _ = step1(s1, shard0, lr, jax.random.key(5), cw)

    for a, b in zip(
        jax.tree.leaves(n8.batch_stats), jax.tree.leaves(n1.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )



def test_initialize_distributed_plumbing(monkeypatch):
    """Multi-host bring-up is reachable from config (VERDICT r2 #7):
    the no-op path, the flag plumbing, and idempotence."""
    import pcseg_tpu.parallel.mesh as mesh_mod
    from pcseg_tpu.core.config import Config, apply_overrides

    # no coordinator -> no-op (the single-process default path)
    monkeypatch.setattr(mesh_mod, "_distributed_initialized", False)
    assert mesh_mod.initialize_distributed(None) is False

    calls = []
    monkeypatch.setattr(
        mesh_mod.jax.distributed,
        "initialize",
        lambda **kw: calls.append(kw),
    )
    assert mesh_mod.initialize_distributed("10.0.0.1:8476", 2, 1) is True
    assert calls == [dict(
        coordinator_address="10.0.0.1:8476", num_processes=2, process_id=1
    )]
    # second call in the same process must not re-initialize
    assert mesh_mod.initialize_distributed("10.0.0.1:8476", 2, 1) is False
    assert len(calls) == 1
    # ... and a DIFFERENT topology must fail loudly, not silently keep
    # the old one (JAX cannot re-initialize in-process)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="already initialized"):
        mesh_mod.initialize_distributed("10.0.0.9:9999", 4, 2)

    # config/CLI override path carries the fields
    cfg = apply_overrides(Config(), [
        "train.coordinator_address=10.0.0.1:8476",
        "train.num_processes=2",
        "train.process_id=0",
    ])
    assert cfg.train.coordinator_address == "10.0.0.1:8476"
    assert cfg.train.num_processes == 2 and cfg.train.process_id == 0


def test_predictor_data_axis_serving(mesh8, small_events):
    """Mesh-sharded predict_batch (the reference's DataParallel inference,
    pcs.py:412-420) must produce identical predictions to single-device
    serving (VERDICT r2 #8)."""
    from pcseg_tpu.infer import Predictor

    model = PointNetSeg(num_classes=4)
    variables = model.init(jax.random.key(0))
    events = [np.asarray(e[0]) for e in small_events[:10]]
    p1 = Predictor(variables, 4, model=model)
    p8 = Predictor(variables, 4, model=model, mesh=mesh8)
    out1 = p1.predict_batch(events, batch_size=8)
    out8 = p8.predict_batch(events, batch_size=4)  # rounds up to 8
    for a, b in zip(out1, out8):
        np.testing.assert_array_equal(a, b)
