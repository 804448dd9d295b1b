"""Losses.

``weighted_masked_cross_entropy`` reproduces
``nn.CrossEntropyLoss(ignore_index=-1, weight=w)`` (pcs.py:216) exactly,
including PyTorch's weighted-mean normalization: the sum of per-target
``w[y_i] * nll_i`` is divided by the SUM OF WEIGHTS of non-ignored targets,
not by their count (SURVEY.md §7 hard-part 5 — getting this wrong silently
changes training dynamics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_sums(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    ignore_index: int = -1,
):
    """Partial sums for weighted masked CE: (sum_i w[y_i]*nll_i, sum_i w[y_i]).

    The split form lets data-parallel callers psum both terms and divide
    once, reproducing the reference's single-device loss exactly under
    sharding (train/steps.py).

    Perf note: everything is one-hot contractions, NOT gathers —
    ``class_weights[labels]`` / ``take_along_axis`` lower to per-element
    dynamic gathers on TPU that cost ~50x the rest of the step combined.
    One-hot compare + multiply-reduce stays on the VPU.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    onehot = (
        safe[..., None] == jnp.arange(num_classes, dtype=safe.dtype)
    ).astype(jnp.float32)

    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.sum(logits * onehot, axis=-1)
    nll = logz - true_logit

    if class_weights is None:
        w = valid.astype(jnp.float32)
    else:
        class_weights = class_weights.astype(jnp.float32)
        if class_weights.shape != (num_classes,):
            raise ValueError(
                f"class_weights shape {class_weights.shape} != ({num_classes},)"
            )
        w = jnp.where(
            valid, jnp.sum(onehot * class_weights, axis=-1), 0.0
        )

    return jnp.sum(w * nll), jnp.sum(w)


def weighted_masked_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    ignore_index: int = -1,
) -> jax.Array:
    """Mean weighted CE over non-ignored targets.

    logits: (..., C) float; labels: (...) int with ``ignore_index`` padding
    (the reference pads labels with -1, pcs.py:54). Returns a scalar f32.
    Matches ``nn.CrossEntropyLoss(ignore_index=-1, weight=w)`` (pcs.py:216)
    including the divide-by-sum-of-weights normalization.
    """
    total, denom = cross_entropy_sums(
        logits, labels, class_weights, ignore_index
    )
    return total / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
