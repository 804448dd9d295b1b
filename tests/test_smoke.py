"""End-to-end smoke: init -> forward -> train step on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.data.batching import pad_events
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.train.optim import make_optimizer
from pcseg_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _batch(events, bucket=512, batch_size=8):
    points, labels, masks = pad_events(events[:batch_size], bucket, batch_size)
    return jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks)


def test_forward_shapes(small_events):
    model = PointNetSeg(num_classes=4)
    variables = model.init(jax.random.key(0))
    points, labels, masks = _batch(small_events)
    logits = model.apply(variables, points, train=False)
    assert logits.shape == (8, 512, 4)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_runs_and_learns(mesh8, small_events):
    model = PointNetSeg(num_classes=4)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    train_step = make_train_step(model, tx, mesh8, donate=False)
    eval_step = make_eval_step(model, mesh8, num_classes=4)

    batch = _batch(small_events)
    losses = []
    for i in range(30):
        state, metrics = train_step(
            state, batch, jnp.float32(1e-3), jax.random.key(i),
            jnp.ones((4,), jnp.float32),
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # memorizing one batch must drive the loss down hard
    assert losses[-1] < losses[0] * 0.7, losses[::5]

    em = eval_step(state, batch, jnp.ones((4,), jnp.float32))
    assert float(em["total"]) > 0
    cm = np.asarray(em["confusion"])
    assert cm.sum() == int(em["total"])
