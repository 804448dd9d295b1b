"""Eval-mode BN folding: collapse conv+BN into one affine matmul.

In eval mode BatchNorm is a per-channel affine transform with constants
(running stats, pcs.py eval semantics), so

    BN(x @ W + b) = x @ (W * s) + ((b - mean) * s + beta),  s = gamma/sqrt(var+eps)

The folded network is a pure matmul+ReLU chain — one kernel per layer, no
separate normalize pass, and XLA fuses ReLU into the matmul epilogue. This
is the serving path; training keeps live statistics.
"""

from __future__ import annotations

import jax

from pcseg_tpu.ops.batchnorm import EPS


def fold_dense_bn(dense: dict, bn_params: dict, bn_state: dict) -> dict:
    """Fold one [dense -> eval-BN] pair into an equivalent dense layer."""
    s = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + EPS)
    return {
        "kernel": dense["kernel"] * s[None, :],
        "bias": (dense["bias"] - bn_state["mean"]) * s + bn_params["bias"],
    }


def fold_pointnet(variables: dict) -> dict:
    """Fold every BN of a PointNetSeg {params, batch_stats} into its conv.

    Returns a params-only pytree with the same conv names (the final
    seg_conv4 has no BN and passes through unchanged).
    """
    from pcseg_tpu.models.pointnet import BN_FOR

    params = variables["params"]
    stats = variables["batch_stats"]
    folded = {}
    for name, bn_name in BN_FOR.items():
        folded[name] = fold_dense_bn(
            params[name], params[bn_name], stats[bn_name]
        )
    folded["seg_conv4"] = dict(params["seg_conv4"])
    return folded
