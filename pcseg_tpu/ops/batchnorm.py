"""BatchNorm over the point axis, matching ``torch.nn.BatchNorm1d``.

Reference usage: BatchNorm1d over ``(B, C, M)`` activations after every 1x1
conv (pcs.py:86-94, applied :106-127). Parity-critical semantics
(SURVEY.md §2.2 quirks):

- *training*: normalize with the biased batch variance over the (B, M)
  positions; update running stats with ``running = (1-m)*running + m*stat``
  where the variance stat is the UNBIASED one (n/(n-1)), momentum m=0.1,
  eps=1e-5 — exactly torch's rule.
- *eval*: normalize with running stats.
- padded (zero) positions ARE part of the statistics in the reference
  (zero-pad at pcs.py:53 is never masked inside the model). ``mask=None``
  reproduces that; passing a mask gives the opt-in masked variant
  (ModelConfig.mask_norm_and_pool).

State split: the affine ``scale``/``bias`` are trainable parameters (torch
optimizes them — and applies weight decay to them — like any other param),
while ``mean``/``var`` running stats are non-trained state. They therefore
live in separate pytrees (``params[bn_name]`` vs ``batch_stats[bn_name]``).

Layout note: we keep activations channels-last ``(B, M, C)`` — the natural
layout for MXU matmuls — instead of torch's ``(B, C, M)``; statistics are
taken over axes (0, 1), which is the same set of positions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def _psum(v: jax.Array, axes) -> jax.Array:
    """psum that first pvary-promotes ``v`` over any requested axis it is
    not yet varying on (VMA typing requires exact axis states)."""
    axes_t = (axes,) if isinstance(axes, str) else tuple(axes)
    vma = getattr(jax.typeof(v), "vma", None)
    if vma is not None:
        missing = tuple(a for a in axes_t if a not in vma)
        if missing:
            pcast = getattr(jax.lax, "pcast", None)
            if pcast is not None:
                v = pcast(v, missing, to="varying")
            else:  # older jax
                v = jax.lax.pvary(v, missing)
    return jax.lax.psum(v, axes_t)


def bn_param_init(num_features: int) -> dict:
    """Trainable affine params (torch: weight=1, bias=0)."""
    return {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }


def bn_state_init(num_features: int) -> dict:
    """Running statistics (torch: running_mean=0, running_var=1)."""
    return {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }


def bn_init(num_features: int) -> tuple[dict, dict]:
    return bn_param_init(num_features), bn_state_init(num_features)


def _masked_moments(
    x: jax.Array, mask: Optional[jax.Array], fast: bool = False
):
    """Biased mean/var per channel over (B, M); x is (B, M, C) float32.

    ``fast=True`` uses single-pass E[x^2]-mu^2 (one read of the activation
    instead of two — ~15% off the whole PointNet train step); the default
    two-pass centered variance matches torch bit-for-bit.
    """
    if mask is None:
        mean = jnp.mean(x, axis=(0, 1))
        if fast:
            var = jnp.mean(jnp.square(x), axis=(0, 1)) - jnp.square(mean)
        else:
            var = jnp.mean(jnp.square(x - mean), axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        return mean, var, jnp.asarray(n, jnp.float32)
    m = mask.astype(x.dtype)[..., None]            # (B, M, 1)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=(0, 1)) / n
    if fast:
        var = jnp.sum(jnp.square(x) * m, axis=(0, 1)) / n - jnp.square(mean)
    else:
        var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1)) / n
    return mean, var, n


def batchnorm_train(
    bn_params: dict,
    bn_state: dict,
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    fast_stats: bool = False,
):
    """Training-mode BN. Returns (y, new_bn_state).

    ``axis_name``: if set, batch statistics are psum-synced across that mesh
    axis (sync-BN). The reference's DataParallel uses per-replica stats
    (pcs.py:211), so the default is None.
    """
    xf = x.astype(jnp.float32)
    if axis_name is None:
        mean, var, n = _masked_moments(xf, mask, fast=fast_stats)
        if fast_stats:
            # E[x^2]-mu^2 cancellation can go slightly negative
            var = jnp.maximum(var, 0.0)
    else:
        # Two-pass cross-replica moments: psum the sums for the global
        # mean, then psum the centered squares. Same result as computing
        # on the unsharded batch (the E[x^2]-mu^2 shortcut would lose
        # precision to cancellation and break bit-comparability with the
        # single-device path).
        m = (
            mask.astype(xf.dtype)[..., None]
            if mask is not None
            else jnp.ones(xf.shape[:2] + (1,), xf.dtype)
        )
        n = _psum(jnp.sum(m), axis_name)
        n = jnp.maximum(n, 1.0)
        mean = _psum(jnp.sum(xf * m, axis=(0, 1)), axis_name) / n
        var = (
            _psum(
                jnp.sum(jnp.square(xf - mean) * m, axis=(0, 1)), axis_name
            )
            / n
        )
    inv = jax.lax.rsqrt(var + EPS)
    y = (xf - mean) * inv * bn_params["scale"] + bn_params["bias"]
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_state = {
        "mean": (1.0 - MOMENTUM) * bn_state["mean"] + MOMENTUM * mean,
        "var": (1.0 - MOMENTUM) * bn_state["var"] + MOMENTUM * unbiased,
    }
    return y.astype(x.dtype), new_state


def batchnorm_eval(bn_params: dict, bn_state: dict, x: jax.Array) -> jax.Array:
    """Eval-mode BN using running stats (torch .eval())."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(bn_state["var"] + EPS)
    y = (xf - bn_state["mean"]) * inv * bn_params["scale"] + bn_params["bias"]
    return y.astype(x.dtype)
