"""Fused LN+affine+ReLU+mask Pallas kernel vs the XLA formulation.

Runs in Pallas interpret mode on CPU; the block-sparse U-Net exercises
the compiled TPU path (models/sparse_unet.py _ln_relu_mask gates on
backend). Values and the full VJP (dx, dscale, dbias) must match the
single-pass-moments XLA form the model uses as its CPU fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.ops.pallas.fused_ln import ln_relu_mask

N, C = 512, 64
EPS = 1e-5


def _ref(x, scale, bias, active):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean),
        0.0,
    )
    z = (xf - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    return jnp.where(active[:, None], jnp.maximum(z, 0.0), 0.0)


def _args(rng):
    x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.1
    active = jnp.asarray(rng.uniform(size=(N,)) < 0.3)
    return x, scale, bias, active


def test_forward_matches_xla(rng):
    x, scale, bias, active = _args(rng)
    got = ln_relu_mask(x, scale, bias, active, EPS, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, scale, bias, active)),
        atol=1e-5, rtol=1e-5,
    )


def test_inactive_rows_are_zero(rng):
    x, scale, bias, _ = _args(rng)
    active = jnp.zeros((N,), bool)
    got = ln_relu_mask(x, scale, bias, active, EPS, jnp.float32)
    assert not np.asarray(got).any()


def test_vjp_matches_xla(rng):
    x, scale, bias, active = _args(rng)
    ct = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

    def scal(op):
        return lambda x_, s_, b_: jnp.sum(op(x_, s_, b_) * ct)

    g_ref = jax.grad(
        scal(lambda x_, s_, b_: _ref(x_, s_, b_, active)), argnums=(0, 1, 2)
    )(x, scale, bias)
    g_pal = jax.grad(
        scal(lambda x_, s_, b_: ln_relu_mask(
            x_, s_, b_, active, EPS, jnp.float32)),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for name, a, b in zip(["dx", "dscale", "dbias"], g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_non_pow2_rows_pick_smaller_tile(rng):
    # N = 24 forces the tile-halving path (24 % 1024 != 0 -> tile 8)
    x = jnp.asarray(rng.normal(size=(24, C)), jnp.float32)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    active = jnp.ones((24,), bool)
    got = ln_relu_mask(x, scale, bias, active, EPS, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, scale, bias, active)),
        atol=1e-5, rtol=1e-5,
    )


def test_partial_last_block_vjp(rng):
    # N = 27 is NOT a multiple of 8: the last grid block is partial and
    # the bwd kernel must row-mask it or dscale/dbias accumulate over
    # unspecified padding rows (r4 advisor finding). Exercise the full
    # VJP at this shape against the XLA reference.
    n = 27
    x = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.1
    active = jnp.asarray(rng.uniform(size=(n,)) < 0.5)
    ct = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)

    def scal(op):
        return lambda x_, s_, b_: jnp.sum(op(x_, s_, b_) * ct)

    got = ln_relu_mask(x, scale, bias, active, EPS, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, scale, bias, active)),
        atol=1e-5, rtol=1e-5,
    )
    g_ref = jax.grad(
        scal(lambda x_, s_, b_: _ref(x_, s_, b_, active)), argnums=(0, 1, 2)
    )(x, scale, bias)
    g_pal = jax.grad(
        scal(lambda x_, s_, b_: ln_relu_mask(
            x_, s_, b_, active, EPS, jnp.float32)),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for name, a, b in zip(["dx", "dscale", "dbias"], g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=f"grad mismatch for {name} at partial tile",
        )


def test_bf16_output_dtype(rng):
    x, scale, bias, active = _args(rng)
    got = ln_relu_mask(x, scale, bias, active, EPS, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(_ref(x, scale, bias, active)),
        atol=3e-2, rtol=3e-2,
    )


def test_bias_ln_relu_mask_matches_unfused(rng):
    # bias_ln_relu_mask(x, pb, ...) == ln_relu_mask(x + pb, ...) in
    # values and in all gradients (incl. the new dpre_bias output)
    from pcseg_tpu.ops.pallas.fused_ln import bias_ln_relu_mask

    n = 64
    x = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)
    pb = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.1
    active = jnp.asarray(rng.uniform(size=(n,)) < 0.6)
    ct = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)

    got = bias_ln_relu_mask(x, pb, scale, bias, active, EPS, jnp.float32)
    want = _ref(x + pb, scale, bias, active)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    g_ref = jax.grad(
        lambda x_, pb_, s_, b_: jnp.sum(_ref(x_ + pb_, s_, b_, active) * ct),
        argnums=(0, 1, 2, 3),
    )(x, pb, scale, bias)
    g_pal = jax.grad(
        lambda x_, pb_, s_, b_: jnp.sum(
            bias_ln_relu_mask(x_, pb_, s_, b_, active, EPS, jnp.float32) * ct
        ),
        argnums=(0, 1, 2, 3),
    )(x, pb, scale, bias)
    for name, a, b in zip(["dx", "dpre_bias", "dscale", "dbias"],
                          g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )
