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


def weighted_masked_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    ignore_index: int = -1,
) -> jax.Array:
    """Mean weighted CE over non-ignored targets.

    logits: (..., C) float; labels: (...) int with ``ignore_index`` padding
    (the reference pads labels with -1, pcs.py:54). Returns a scalar f32.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)

    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1
    ).squeeze(-1)
    nll = logz - true_logit

    if class_weights is None:
        w = valid.astype(jnp.float32)
    else:
        class_weights = class_weights.astype(jnp.float32)
        if class_weights.shape != (num_classes,):
            raise ValueError(
                f"class_weights shape {class_weights.shape} != ({num_classes},)"
            )
        w = jnp.where(valid, class_weights[safe_labels], 0.0)

    total = jnp.sum(w * nll)
    denom = jnp.maximum(jnp.sum(w), jnp.finfo(jnp.float32).tiny)
    return total / denom
