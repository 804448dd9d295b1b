"""Class scan + inverse-frequency weighting.

Reproduces the reference's dataset analysis (pcs.py:146-189) exactly:

- scan the first ``min(scan_events, len(ds))`` events (pcs.py:149);
- ``num_classes = len(set(labels))`` — NOTE this assumes labels are
  contiguous 0..C-1; a class absent from the sample silently shrinks the
  logit dimension (SURVEY.md §2.2 quirk). We keep that rule for parity but
  also report ``max_label + 1`` so callers can detect the hazard.
- weights: ``max_count / count`` per class (pcs.py:173), boost the target
  class (2) by 2x (pcs.py:175-176), absent classes get 1.0 (pcs.py:179),
  then normalize so weights sum to num_classes (pcs.py:182-183).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np


@dataclass
class ClassStats:
    num_classes: int
    max_label_plus_one: int
    counts: dict[int, int]
    weights: np.ndarray  # (num_classes,) float32, sums to num_classes


def scan_classes(
    dataset,
    scan_events: int = 1000,
    target_class: int = 2,
    target_boost: float = 2.0,
) -> ClassStats:
    counts: Counter = Counter()
    n = min(scan_events, len(dataset))
    for i in range(n):
        _, labels = dataset[i]
        vals, c = np.unique(np.asarray(labels), return_counts=True)
        for v, k in zip(vals, c):
            counts[int(v)] += int(k)
    if not counts:
        raise ValueError("no labels found in scan")
    num_classes = len(counts)                      # pcs.py:153 rule
    max_label_plus_one = max(counts) + 1
    max_count = max(counts.values())
    weights = []
    for class_id in range(num_classes):
        if class_id in counts:
            w = max_count / counts[class_id]
            if class_id == target_class:
                w *= target_boost
            weights.append(w)
        else:
            weights.append(1.0)
    weights = np.asarray(weights, np.float64)
    weights = weights * num_classes / weights.sum()
    return ClassStats(
        num_classes=num_classes,
        max_label_plus_one=max_label_plus_one,
        counts=dict(counts),
        weights=weights.astype(np.float32),
    )
