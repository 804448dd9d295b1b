"""Pointwise (1x1-conv) dense blocks — the reference's hottest code.

Every conv in the reference model is ``nn.Conv1d(Cin, Cout, kernel_size=1)``
(pcs.py:70-83): a per-point shared MLP, i.e. one matmul per layer over all
B*M points. The TPU-native formulation keeps activations channels-last
``(B, M, C)`` and runs ``x @ W + b`` with ``dot_general`` so XLA tiles it
straight onto the MXU and fuses the following BN scale/offset and ReLU into
the matmul epilogue. A hand-fused Pallas variant lives in
``pcseg_tpu.ops.pallas.fused_mlp`` for the full encoder stack.

Init matches torch Conv1d defaults (kaiming_uniform with a=sqrt(5), which
for k=1 reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
bias) so fresh models are distributionally torch-identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.batchnorm import batchnorm_eval, batchnorm_train


def dense_init(key: jax.Array, in_dim: int, out_dim: int) -> dict:
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for kernel and bias (torch Conv1d k=1)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return {
        "kernel": jax.random.uniform(
            kw, (in_dim, out_dim), jnp.float32, -bound, bound
        ),
        "bias": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def pointwise_dense(p: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """(B, M, Cin) @ (Cin, Cout) + b -> (B, M, Cout)."""
    dt = compute_dtype or x.dtype
    y = jax.lax.dot_general(
        x.astype(dt),
        p["kernel"].astype(dt),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + p["bias"]


def pointwise_block(
    dense: dict,
    bn_params: dict,
    bn_state: dict,
    x: jax.Array,
    *,
    train: bool,
    relu: bool = True,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    compute_dtype=None,
    fast_stats: bool = False,
):
    """[1x1 conv -> BN -> ReLU] — one reference encoder/head stage
    (pcs.py:106-113, 123-127). Returns (y, new_bn_state_or_None).
    """
    y = pointwise_dense(dense, x, compute_dtype)
    if train:
        y, new_bn = batchnorm_train(
            bn_params, bn_state, y, mask=mask, axis_name=axis_name,
            fast_stats=fast_stats,
        )
    else:
        y, new_bn = batchnorm_eval(bn_params, bn_state, y), None
    if relu:
        y = jnp.maximum(y, 0.0)
    return y, new_bn
