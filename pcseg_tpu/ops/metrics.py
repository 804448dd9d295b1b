"""Metrics: masked accuracy, confusion matrix, sklearn-parity F1.

The reference computes masked accuracy per batch (pcs.py:260-266, 298-304)
and runs a THIRD full validation sweep per epoch just to collect
predictions for ``sklearn.metrics.f1_score`` on the host (pcs.py:314-346).
Here F1 is derived from a confusion matrix accumulated on-device during the
single validation pass — identical numbers, one sweep, no host gather of
per-point arrays.

sklearn parity rules implemented (SURVEY.md §7 hard-part 6):
- ``average=None`` / per-class: F1 over labels 0..C-1; classes with
  tp+fp+fn == 0 get 0.0 (sklearn's zero_division=0 convention, since
  0/0 -> 0).
- ``average='macro'``: mean over labels PRESENT in y_true or y_pred only
  (sklearn restricts to observed labels when ``labels=None``).
- ``average='weighted'``: support-weighted mean over observed labels.
Model selection hinges on ``f1_per_class[2]`` (pcs.py:346), so these edge
conventions are load-bearing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def masked_accuracy(
    logits: jax.Array, labels: jax.Array, mask: jax.Array
):
    """Returns (num_correct, num_valid) as f32 scalars.

    Matches pcs.py:261-266: argmax over classes, count matches on valid
    positions only.
    """
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(((pred == labels) & mask).astype(jnp.float32))
    total = jnp.sum(mask.astype(jnp.float32))
    return correct, total


def confusion_matrix(
    pred: jax.Array, labels: jax.Array, mask: jax.Array, num_classes: int
) -> jax.Array:
    """(C, C) int32 matrix, rows = true class, cols = predicted class.

    Formulated as a one-hot contraction (one (N,C)x(N,C) matmul) rather
    than a scatter-add: TPU scatters serialize on colliding indices, which
    makes the naive ``.at[idx].add(1)`` the slowest op in the eval step.
    """
    valid = (mask & (labels >= 0)).astype(jnp.float32)
    classes = jnp.arange(num_classes)
    oh_true = (
        jnp.where(mask, labels, -1).reshape(-1)[:, None] == classes
    ).astype(jnp.float32) * valid.reshape(-1)[:, None]
    oh_pred = (pred.reshape(-1)[:, None] == classes).astype(jnp.float32)
    cm = jax.lax.dot_general(
        oh_true,
        oh_pred,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return cm.astype(jnp.int32)


class F1Scores(NamedTuple):
    per_class: np.ndarray   # (C,) f64
    macro: float
    weighted: float


def f1_from_confusion(cm: np.ndarray) -> F1Scores:
    """sklearn-identical F1 from a confusion matrix (host-side, float64)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    support = cm.sum(axis=1)          # true count per class
    predicted = cm.sum(axis=0)        # predicted count per class
    denom = support + predicted       # = 2tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        f1 = np.where(denom > 0, 2.0 * tp / np.maximum(denom, 1e-300), 0.0)
    observed = (support > 0) | (predicted > 0)
    macro = float(f1[observed].mean()) if observed.any() else 0.0
    total_support = support.sum()
    weighted = (
        float((f1 * support).sum() / total_support) if total_support > 0 else 0.0
    )
    return F1Scores(per_class=f1, macro=macro, weighted=weighted)
