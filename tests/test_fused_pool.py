"""Fused normalize+ReLU+global-max-pool op vs the plain-jnp formulation.

Runs in Pallas interpret mode on CPU; bench.py exercises the compiled TPU
path. Gradients compare on tie-free inputs (random floats): with ties the
fused op routes the gradient to the FIRST max row (torch.max semantics)
while jnp.max splits evenly — a documented deviation that only matters
for identical padded rows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.ops.pallas.fused_pool import fused_global_pool

B, M, C = 4, 256, 64


def _args(rng):
    y = jnp.asarray(rng.normal(size=(B * M, C)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.1
    inv = jnp.asarray(rng.uniform(0.5, 2.0, size=(C,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.1
    return y, mu, inv, gamma, beta


def _ref(y, mu, inv, gamma, beta):
    z = jnp.maximum((y - mu) * inv * gamma + beta, 0.0)
    return jnp.max(z.reshape(B, M, C), axis=1)


def test_fused_pool_forward(rng):
    args = _args(rng)
    np.testing.assert_allclose(
        np.asarray(fused_global_pool(*args, M)),
        np.asarray(_ref(*args)),
        atol=1e-5,
    )


def test_fused_pool_vjp_matches_jnp(rng):
    args = _args(rng)
    ct = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)

    def scal(op):
        return lambda *a: jnp.sum(op(*a) * ct)

    g_ref = jax.grad(scal(_ref), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(
        scal(lambda *a: fused_global_pool(*a, M)), argnums=(0, 1, 2, 3, 4)
    )(*args)
    for name, a, b in zip(["y", "mu", "inv", "gamma", "beta"], g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_pool_all_negative_channel(rng):
    """A channel whose z is everywhere negative pools to exactly 0 and
    contributes zero gradient."""
    y, mu, inv, gamma, beta = _args(rng)
    beta = beta.at[0].set(-100.0)  # channel 0: z < 0 everywhere
    out = fused_global_pool(y, mu, inv, gamma, beta, M)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), 0.0)
    dy = jax.grad(
        lambda y: jnp.sum(fused_global_pool(y, mu, inv, gamma, beta, M))
    )(y)
    np.testing.assert_array_equal(np.asarray(dy[:, 0]), 0.0)
    assert np.abs(np.asarray(dy)).sum() > 0  # other channels still flow
