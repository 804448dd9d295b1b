"""Direct parity tests for the fused one-hot plane kernels.

ops/voxel.py dispatches to these only on real TPU (the Pallas HLO
interpreter can't run under vma-typed shard_map), so the CPU suite
exercises the kernels here explicitly in interpret mode against a
dense numpy one-hot formulation.
"""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _dense_a(idx, wt, zy):
    """Dense (B, M, ZY) tap matrix: sum of one-hot taps, f32-accumulated
    then bf16-rounded when weighted — the kernel's _build_a order."""
    b, m, t = idx.shape
    a = np.zeros((b, m, zy), np.float32)
    for k in range(t):
        hit = idx[..., k, None] == np.arange(zy)[None, None]
        w = 1.0 if wt is None else wt[..., k, None].astype(np.float32)
        a += np.where(hit, w, 0.0)
    if wt is not None:
        a = np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
    return a


def test_plane_contract_unit_weights(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import plane_contract

    b, m, zy, n = 2, 700, 64, 48          # m % chunk != 0 -> pad path
    idx = rng.integers(0, zy + 1, (b, m, 1)).astype(np.int32)  # incl. sentinel
    d = jnp.asarray(rng.normal(size=(b, m, n)), jnp.bfloat16)
    out = plane_contract(jnp.asarray(idx), None, d, zy, interpret=True)
    a = _dense_a(idx, None, zy)
    ref = np.einsum(
        "bmz,bmn->bzn", a, np.asarray(d, np.float32), optimize=True
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_plane_contract_weighted_taps(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import plane_contract

    b, m, zy, n, t = 2, 512, 36, 24, 4
    idx = rng.integers(0, zy + 1, (b, m, t)).astype(np.int32)
    # duplicate taps on purpose (clipped-edge semantics accumulate)
    idx[:, :32, 1] = idx[:, :32, 0]
    wt = rng.random((b, m, t)).astype(np.float32)
    d = jnp.asarray(rng.normal(size=(b, m, n)), jnp.bfloat16)
    out = plane_contract(
        jnp.asarray(idx), jnp.asarray(wt), d, zy, interpret=True
    )
    a = _dense_a(idx, wt, zy)
    ref = np.einsum(
        "bmz,bmn->bzn", a, np.asarray(d, np.float32), optimize=True
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)


def test_plane_gather_matches_dense(rng):
    from pcseg_tpu.ops.pallas.onehot_contract import plane_gather

    b, m, zy, n, t = 2, 600, 49, 32, 4
    idx = rng.integers(0, zy + 1, (b, m, t)).astype(np.int32)
    wt = rng.random((b, m, t)).astype(np.float32)
    g = jnp.asarray(rng.normal(size=(b, zy, n)), jnp.float32)
    out = plane_gather(
        jnp.asarray(idx), jnp.asarray(wt), g, interpret=True
    )
    assert out.shape == (b, m, n)
    a = _dense_a(idx, wt, zy)
    ref = np.einsum(
        "bmz,bzn->bmn", a,
        np.asarray(g.astype(jnp.bfloat16), np.float32), optimize=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)
