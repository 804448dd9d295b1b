"""Parity tests for the fused global-layer+pool op (ops/pallas/fused_global).

Runs in interpret mode on the CPU mesh (conftest pins JAX_PLATFORMS=cpu),
comparing against the plain XLA composition of the same contract:
bn5-normalize -> relu -> matmul -> stats -> sign-adjusted raw max pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.ops.pallas.fused_global import fused_global_pool_block

B, M, CIN, COUT = 4, 64, 128, 256
N = B * M
TILE = 32


def _make(seed=0, gamma_pattern="mixed"):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, CIN)), jnp.bfloat16)
    mu = jnp.asarray(rng.normal(size=(CIN,)) * 0.1, jnp.float32)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, size=(CIN,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(CIN,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(CIN,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(CIN, COUT)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(COUT,)) * 0.1, jnp.float32)
    gam_g = jnp.asarray(rng.normal(size=(COUT,)), jnp.float32)
    if gamma_pattern == "mixed":
        # force every sign case incl. exact zero
        gam_g = gam_g.at[0].set(0.0).at[1].set(-1.3).at[2].set(0.7)
    return x, mu, inv, gamma, beta, w, b, gam_g


def _ref(x, mu, inv, gamma, beta, w, b, sign, out_dtype=jnp.bfloat16):
    """XLA reference of the op contract (raw-space sign pool)."""
    a = jnp.maximum(
        (x.astype(jnp.float32) - mu) * inv * gamma + beta, 0.0
    ).astype(jnp.bfloat16)
    y = (
        jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b
    )
    s1 = jnp.sum(y, axis=0)
    s2 = jnp.sum(jnp.square(y), axis=0)
    # match the kernel: pool compares the STORED (out_dtype) y
    ystored = y.astype(out_dtype).astype(jnp.float32)
    sm = (ystored * sign).reshape(B, M, COUT)
    best = jnp.max(sm, axis=1)
    idx = jnp.argmax(sm, axis=1)  # first max, torch semantics
    return s1, s2, best, idx


def test_forward_matches_xla_reference():
    x, mu, inv, gamma, beta, w, b, gam_g = _make()
    sign = jnp.sign(gam_g)
    s1, s2, best, idx = fused_global_pool_block(
        x, mu, inv, gamma, beta, w, b, sign, M, TILE
    )
    rs1, rs2, rbest, ridx = _ref(x, mu, inv, gamma, beta, w, b, sign)
    np.testing.assert_allclose(s1, rs1, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(s2, rs2, rtol=2e-2, atol=2e-1)
    np.testing.assert_allclose(best, rbest, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx) % M)


def test_pooled_feature_glue_matches_normalized_pool():
    """relu((sign*best - mu_g)*inv_g*gamma_g + beta_g) must equal the max
    over points of relu(normalized y) — the monotonicity argument."""
    x, mu, inv, gamma, beta, w, b, gam_g = _make(seed=1)
    bet_g = jnp.asarray(
        np.random.default_rng(2).normal(size=(COUT,)) * 0.1, jnp.float32
    )
    sign = jnp.sign(gam_g)
    s1, s2, best, idx = fused_global_pool_block(
        x, mu, inv, gamma, beta, w, b, sign, M, TILE
    )
    n = jnp.float32(N)
    mu_g = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mu_g), 0.0)
    inv_g = jax.lax.rsqrt(var + 1e-5)
    y_best = sign * best
    z_best = jnp.where(
        gam_g == 0.0, bet_g, (y_best - mu_g) * inv_g * gam_g + bet_g
    )
    g = jnp.maximum(z_best, 0.0)

    # reference: normalize the whole tensor, relu, max over points
    _, _, _, _ = s1, s2, best, idx
    a = jnp.maximum(
        (x.astype(jnp.float32) - mu) * inv * gamma + beta, 0.0
    ).astype(jnp.bfloat16)
    y = (
        jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b
    ).astype(jnp.bfloat16).astype(jnp.float32)
    z = (y - mu_g) * inv_g * gam_g + bet_g
    gref = jnp.max(jnp.maximum(z, 0.0).reshape(B, M, COUT), axis=1)
    np.testing.assert_allclose(g, gref, rtol=1e-4, atol=1e-4)


def test_gradients_match_xla_composition():
    # f32 activation storage: bf16 quantization creates pooled TIES, where
    # the kernel (first winner, torch semantics) and jnp.max's VJP (even
    # split) both produce valid but different subgradients. In f32 the
    # max is unique and the gradients must agree.
    x, mu, inv, gamma, beta, w, b, gam_g = _make(seed=3)
    sign = jnp.sign(gam_g)

    def loss_fused(args):
        x, mu, inv, gamma, beta, w, b = args
        s1, s2, best, _ = fused_global_pool_block(
            x, mu, inv, gamma, beta, w, b, sign, M, TILE, jnp.float32
        )
        return (
            jnp.sum(best * jnp.cos(jnp.arange(COUT)))
            + jnp.sum(s1) * 1e-2
            + jnp.sum(s2) * 1e-3
        )

    def loss_ref(args):
        x, mu, inv, gamma, beta, w, b = args
        s1, s2, best, _ = _ref(
            x, mu, inv, gamma, beta, w, b, sign, jnp.float32
        )
        return (
            jnp.sum(best * jnp.cos(jnp.arange(COUT)))
            + jnp.sum(s1) * 1e-2
            + jnp.sum(s2) * 1e-3
        )

    args = (x, mu, inv, gamma, beta, w, b)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, (got, want) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=3e-2, atol=3e-2,
            err_msg=f"grad argument {a}",
        )


def test_tile_must_divide_rows_per_batch():
    x, mu, inv, gamma, beta, w, b, gam_g = _make()
    with pytest.raises(Exception):
        jax.eval_shape(
            lambda: fused_global_pool_block(
                x, mu, inv, gamma, beta, w, b, jnp.sign(gam_g), M, 48
            )
        )
