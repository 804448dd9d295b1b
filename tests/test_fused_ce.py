"""fused_seg4_ce (classifier + weighted CE + accuracy in one kernel) vs
the XLA composition it replaces — values and every gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.ops.losses import cross_entropy_sums
from pcseg_tpu.ops.pallas.fused_ce import fused_seg4_ce


def _inputs(seed=0, n=64, cin=128, c=4):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, cin)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(cin,)) * 0.1, jnp.float32)
    inv = jnp.asarray(1.0 + rng.random(cin), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(cin,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(cin,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(cin, c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    labels = rng.integers(0, c, size=(n,)).astype(np.int32)
    labels[-n // 4:] = -1  # padded tail
    cw = jnp.asarray([1.0, 2.0, 0.5, 1.5][:c], jnp.float32)
    return x, mu, inv, gamma, beta, w, b, jnp.asarray(labels), cw


def _xla_ref(x, mu, inv, gamma, beta, w, b, labels, cw):
    z = jnp.maximum((x - mu) * inv * gamma + beta, 0.0)
    logits = z @ w + b
    num, den = cross_entropy_sums(logits[None], labels[None], cw)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(((pred == labels) & (labels >= 0)).astype(jnp.float32))
    return num, den, correct


def test_fused_ce_forward_matches_xla():
    args = _inputs()
    num, den, correct = fused_seg4_ce(*args, 4, 16)
    rn, rd, rc = _xla_ref(*args)
    np.testing.assert_allclose(float(num), float(rn), rtol=1e-5)
    np.testing.assert_allclose(float(den), float(rd), rtol=1e-6)
    assert float(correct) == float(rc)


def test_fused_ce_gradients_match_xla():
    x, mu, inv, gamma, beta, w, b, labels, cw = _inputs(seed=1)

    def loss_fused(x, mu, inv, gamma, beta, w, b):
        num, den, _ = fused_seg4_ce(
            x, mu, inv, gamma, beta, w, b, labels, cw, 4, 16
        )
        return num / den

    def loss_ref(x, mu, inv, gamma, beta, w, b):
        num, den, _ = _xla_ref(x, mu, inv, gamma, beta, w, b, labels, cw)
        return num / den

    args = (x, mu, inv, gamma, beta, w, b)
    v_f, g_f = jax.value_and_grad(loss_fused, argnums=tuple(range(7)))(*args)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for a, b_, name in zip(
        g_f, g_r, ("x", "mu", "inv", "gamma", "beta", "w", "b")
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3,
            err_msg=name,
        )


def test_fused_ce_all_rows_padded():
    """A fully-padded tile contributes zeros, not NaNs."""
    x, mu, inv, gamma, beta, w, b, _, cw = _inputs(seed=2, n=32)
    labels = jnp.full((32,), -1, jnp.int32)
    num, den, correct = fused_seg4_ce(
        x, mu, inv, gamma, beta, w, b, labels, cw, 4, 16
    )
    assert float(num) == 0.0 and float(den) == 0.0 and float(correct) == 0.0

    def loss(x):
        num, den, _ = fused_seg4_ce(
            x, mu, inv, gamma, beta, w, b, labels, cw, 4, 16
        )
        return num
    g = jax.grad(loss)(x)
    assert (np.asarray(g) == 0.0).all()


def test_train_step_fused_loss_path(mesh8, small_events):
    """The steps.py fused-loss branch (exercised on CPU via a model stub
    whose supports_fused_loss is forced on) must produce the same loss,
    metrics, and gradient step as the XLA branch."""
    import dataclasses

    import optax

    from pcseg_tpu.data.batching import pad_events
    from pcseg_tpu.models.pointnet import PointNetSeg
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    # On CPU supports_fused_loss() is False (fused chain is TPU-only);
    # this test exercises the steps.py branch SELECTION logic only.
    model = PointNetSeg(num_classes=4, bn_stats="fused")
    assert not model.supports_fused_loss()  # CPU
    tx = optax.identity()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh8, donate=False)
    points, labels, masks = pad_events(small_events[:8], 512, 8)
    state, metrics = step(
        state,
        (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks)),
        jnp.float32(1e-3), jax.random.key(1),
        jnp.ones((4,), jnp.float32),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["total"]) == float(np.asarray(masks).sum())
