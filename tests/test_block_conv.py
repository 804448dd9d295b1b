"""Halo-free Pallas block conv (ops/pallas/block_conv.py): parity vs
the XLA halo formulation (ops/block_sparse.block_subm_conv) in values
and gradients, on the Pallas interpreter (CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.ops.block_sparse import (
    _neighbor_slots,
    block_sparse_from_grid,
    block_subm_conv,
)
from pcseg_tpu.ops.pallas.block_conv import block_conv
from pcseg_tpu.ops.sparse import subm_conv_init
from pcseg_tpu.ops.voxel import voxelize

from tests.test_block_sparse import _event_batch


def _setup(rng, cin=8, cout=8, r=16, tile=4, cap=48):
    pts, mask = _event_batch(rng)
    grid = voxelize(pts, mask, r)
    bs = block_sparse_from_grid(grid, max_tiles=cap, tile=tile)
    feats = jnp.asarray(
        rng.normal(size=bs.feats.shape[:-1] + (cin,)), jnp.float32
    )
    p = subm_conv_init(jax.random.key(0), cin, cout)
    w2 = p["kernel"].reshape(27 * cin, cout)
    t3 = tile ** 3
    b, nt = feats.shape[:2]
    flat = feats.reshape(b, nt, t3, cin)
    sp = _neighbor_slots(bs, +1)
    sm = _neighbor_slots(bs, -1)
    return bs, p, feats, flat, w2, sp, sm


def test_block_conv_matches_xla_halo_conv():
    rng = np.random.default_rng(0)
    bs, p, feats, flat, w2, sp, sm = _setup(rng)
    want = block_subm_conv(p, bs, feats=feats, raw=True)
    got = block_conv(flat, sp, w2, True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(want.shape), np.asarray(want),
        atol=1e-4, rtol=1e-4,
    )


def test_block_conv_gradients_match_xla():
    rng = np.random.default_rng(1)
    bs, p, feats, flat, w2, sp, sm = _setup(rng, cin=8, cout=16)
    ct = jnp.asarray(
        rng.normal(size=flat.shape[:3] + (16,)), jnp.float32
    )

    def loss_xla(f, k):
        y = block_subm_conv(
            {"kernel": k, "bias": p["bias"]}, bs, feats=f, raw=True
        )
        return jnp.sum(y * ct.reshape(y.shape))

    def loss_pal(f, k2):
        return jnp.sum(block_conv(f, sp, k2, True) * ct)

    gx_f, gx_k = jax.grad(loss_xla, argnums=(0, 1))(feats, p["kernel"])
    gp_f, gp_k = jax.grad(loss_pal, argnums=(0, 1))(
        flat, w2
    )
    np.testing.assert_allclose(
        np.asarray(gp_f).reshape(gx_f.shape), np.asarray(gx_f),
        atol=1e-4, rtol=1e-4, err_msg="dfeats mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(gp_k).reshape(gx_k.shape), np.asarray(gx_k),
        atol=1e-4, rtol=1e-4, err_msg="dkernel mismatch",
    )


def test_block_conv_bf16_close():
    rng = np.random.default_rng(2)
    bs, p, feats, flat, w2, sp, sm = _setup(rng)
    want = block_subm_conv(
        p, bs, feats=feats.astype(jnp.bfloat16),
        compute_dtype=jnp.bfloat16, raw=True,
    )
    got = block_conv(flat.astype(jnp.bfloat16), sp,
                     w2.astype(jnp.bfloat16), True)
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)).reshape(want.shape),
        np.asarray(want.astype(jnp.float32)),
        atol=3e-2, rtol=3e-2,
    )


def test_model_block_conv_kernel_branch_matches_xla():
    """conv_impl="interpret" + fused_ln="interpret" runs the model's
    halo-free kernel + fused bias-LN branches under the Pallas
    interpreter on CPU; values and grads must match the pure-XLA model
    (conv_impl="xla", fused_ln=False)."""
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(11)
    pts, mask = _event_batch(rng)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    kw = dict(num_classes=4, grid_size=16, width=16, depth=2, levels=2,
              impl="block", tile=4, max_tiles=64)
    m_x = SparseVoxelNet(**kw, fused_ln=False, conv_impl="xla")
    m_k = SparseVoxelNet(**kw, fused_ln="interpret",
                         conv_impl="interpret")
    v = m_x.init(jax.random.key(7))
    y_x = m_x.apply(v, pts, mask=mask)
    y_k = m_k.apply(v, pts, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_x), np.asarray(y_k), atol=2e-2, rtol=2e-2
    )

    def loss(m):
        def f(params):
            logits, _ = m.apply({"params": params, "batch_stats": {}},
                                pts, train=True, mask=mask)
            oh = jax.nn.one_hot(labels, 4)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))
        return f

    lx, gx = jax.value_and_grad(loss(m_x))(v["params"])
    lk, gk = jax.value_and_grad(loss(m_k))(v["params"])
    np.testing.assert_allclose(float(lx), float(lk), rtol=2e-2)
    flat_k = dict(
        (str(kk), vv)
        for kk, vv in jax.tree_util.tree_leaves_with_path(gk)
    )
    for kp, a in jax.tree_util.tree_leaves_with_path(gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_k[str(kp)]),
            atol=5e-2, rtol=5e-2, err_msg=f"grad mismatch at {kp}",
        )
