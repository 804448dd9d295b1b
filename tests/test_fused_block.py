"""Fused Pallas block: fwd + custom VJP vs a pure-jnp reference.

Runs in Pallas interpret mode on the CPU test mesh; the same code paths
compile natively on TPU (exercised by bench.py and the fused train path).
Dropout sub-tests need the TPU hardware PRNG and are skipped on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.ops.pallas.fused_block import fused_block


def _args(rng, n=512, cin=32, cout=64):
    x = jnp.asarray(rng.normal(size=(n, cin)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(cin,)), jnp.float32) * 0.1
    inv = jnp.asarray(rng.uniform(0.5, 2.0, size=(cin,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(cin,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(cin,)), jnp.float32) * 0.1
    w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32) * 0.1
    return x, mu, inv, gamma, beta, w, b


def _ref_op(x, mu, inv, gamma, beta, w, b, row_bias=None, m=0):
    a = jnp.maximum(((x - mu) * inv) * gamma + beta, 0.0)
    y = a @ w + b
    if row_bias is not None:
        y = y + jnp.repeat(row_bias, m, axis=0)
    return y, jnp.sum(y, axis=0), jnp.sum(jnp.square(y), axis=0)


SEED = jnp.zeros((1,), jnp.int32)


def test_fused_block_forward(rng):
    args = _args(rng)
    ry, rs1, rs2 = _ref_op(*args)
    py, ps1, ps2 = fused_block(
        *args, None, SEED, True, 0.0, True, 0, 128, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(py), np.asarray(ry), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ps1), np.asarray(rs1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ps2), np.asarray(rs2), rtol=1e-4)


def test_fused_block_vjp_matches_jnp(rng):
    """Full VJP including the stats-output cotangents."""
    args = _args(rng)
    ct_y = jnp.asarray(rng.normal(size=(512, 64)), jnp.float32)
    ct_s1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.01
    ct_s2 = jnp.asarray(rng.normal(size=(64,)), jnp.float32) * 0.001

    def scal(op):
        def f(*a):
            y, s1, s2 = op(*a)
            return jnp.sum(y * ct_y) + jnp.sum(s1 * ct_s1) + jnp.sum(s2 * ct_s2)
        return f

    g_ref = jax.grad(scal(_ref_op), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(
        scal(
            lambda *a: fused_block(
                *a, None, SEED, True, 0.0, True, 0, 128, jnp.float32
            )
        ),
        argnums=tuple(range(7)),
    )(*args)
    for name, a, b in zip(
        ["x", "mu", "inv", "gamma", "beta", "w", "b"], g_ref, g_pal
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, rtol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_block_row_bias(rng):
    """Split-matmul row bias: value and gradient."""
    n, m = 512, 128  # 4 batch rows
    args = _args(rng, n=n)
    rb = jnp.asarray(rng.normal(size=(n // m, 64)), jnp.float32)

    ry, _, _ = _ref_op(*args, row_bias=rb, m=m)
    py, _, _ = fused_block(
        *args, rb, SEED, True, 0.0, True, m, 128, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(py), np.asarray(ry), atol=1e-4)

    g_ref = jax.grad(
        lambda rb: jnp.sum(jnp.square(_ref_op(*args, row_bias=rb, m=m)[0]))
    )(rb)
    g_pal = jax.grad(
        lambda rb: jnp.sum(
            jnp.square(
                fused_block(*args, rb, SEED, True, 0.0, True, m, 128,
                            jnp.float32)[0]
            )
        )
    )(rb)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-3
    )


def test_fused_block_no_normalize_no_stats(rng):
    """conv1-style (raw input) and seg4-style (no stats emitted) corners."""
    x, *_ , w, b = _args(rng)
    y, s1, s2 = fused_block(
        x, None, None, None, None, w, b, None, SEED,
        False, 0.0, False, 0, 128, jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x @ w + b), atol=1e-4
    )
    assert s1 is None and s2 is None

    g_ref = jax.grad(lambda x: jnp.sum(jnp.square(x @ w + b)))(x)
    g_pal = jax.grad(
        lambda x: jnp.sum(
            jnp.square(
                fused_block(x, None, None, None, None, w, b, None, SEED,
                            False, 0.0, False, 0, 128, jnp.float32)[0]
            )
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-3
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="hardware PRNG (TPU only)"
)
def test_fused_block_dropout_tpu(rng):
    args = _args(rng)
    y, _, _ = fused_block(*args, None, SEED, True, 0.3, True, 0, 128,
                          jnp.float32)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="hardware PRNG (TPU only)"
)
def test_fused_block_dropout_fwd_bwd_mask_agreement(rng):
    """The backward kernel regenerates dropout masks from
    (seed + program_id) per tile; forward and backward must therefore use
    the SAME row tiling. Regression test for the fwd tile-doubling bug:
    with identity weights and strictly positive inputs, y / x reveals the
    forward keep-mask (~scale or 0) and grad(sum(y)) the backward one.
    The TPU MXU runs f32 matmuls at reduced precision, so kept entries
    carry ~1e-3 wobble — compare masks binarized, values with tolerance.
    """
    n, c = 1024, 128
    x = jnp.asarray(rng.uniform(0.5, 1.5, size=(n, c)), jnp.float32)
    w = jnp.eye(c, dtype=jnp.float32)
    b = jnp.zeros((c,), jnp.float32)

    def op(x):
        y, _, _ = fused_block(
            x, None, None, None, None, w, b, None, SEED,
            True, 0.5, False, 0, 128, jnp.float32,
        )
        return y

    fwd_mask = np.asarray(op(x)) / np.asarray(x)       # ~2.0 kept, 0 dropped
    bwd_mask = np.asarray(jax.grad(lambda x: jnp.sum(op(x)))(x))
    fwd_keep = fwd_mask > 1.0
    bwd_keep = bwd_mask > 1.0
    assert (fwd_keep == bwd_keep).all()
    np.testing.assert_allclose(
        bwd_mask[fwd_keep], fwd_mask[fwd_keep], rtol=2e-2
    )
    # sanity: the mask actually drops roughly half
    keep_frac = fwd_keep.mean()
    assert 0.4 < keep_frac < 0.6, keep_frac


def test_pick_tile_raises_on_indivisible_rows():
    """No silent 8-row fallback: an out-of-bounds final tile would feed
    garbage rows into the fused CE epilogue (labels >= 0 pass the valid
    test), so indivisible shapes must be rejected and routed to XLA."""
    import pytest

    from pcseg_tpu.models.pointnet_fused import _pick_tile

    assert _pick_tile(64 * 2048, 2048, 64, 512) > 8
    with pytest.raises(ValueError, match="multiple of 8"):
        _pick_tile(50, None, 512, 256)
    with pytest.raises(ValueError, match="multiple of 8"):
        _pick_tile(400, 50, 64, 512)
