"""High-level API: fit / predict on raw arrays.

The north-star public surface (BASELINE.json): ``fit`` on a dataset of
``(N, 3+F)`` arrays + labels, ``predict`` per-point classes — wrapping the
reference's script-level workflow (pcs.py:463-484) as a library.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pcseg_tpu.core.config import Config, apply_overrides
from pcseg_tpu.data.hdf5 import PointCloudDataset
from pcseg_tpu.infer import Predictor
from pcseg_tpu.train.loop import TrainResult, train_model


class ArrayDataset:
    """Map-style dataset over in-memory ragged events."""

    def __init__(self, events: Sequence[tuple[np.ndarray, np.ndarray]]):
        self.events = [
            (np.asarray(p, np.float32), np.asarray(l, np.int64))
            for p, l in events
        ]

    def __len__(self):
        return len(self.events)

    def __getitem__(self, idx):
        return self.events[idx]

    def num_points(self, idx):
        return self.events[idx][0].shape[0]


def fit(
    events: Optional[Sequence[tuple[np.ndarray, np.ndarray]]] = None,
    *,
    data_path: Optional[str] = None,
    label_path: Optional[str] = None,
    config: Optional[Config] = None,
    overrides: Sequence[str] = (),
    log=print,
) -> TrainResult:
    """Train on in-memory events or HDF5 files; returns the TrainResult
    (with ``checkpoint_path`` for ``predictor``/``predict``)."""
    cfg = config or Config()
    apply_overrides(cfg, overrides)
    if events is not None:
        dataset = ArrayDataset(events)
        return train_model(cfg, dataset, log=log)
    dp = data_path or cfg.data.data_path
    lp = label_path or cfg.data.label_path
    with PointCloudDataset(dp, lp, feature_dim=cfg.model.input_dim) as ds:
        return train_model(cfg, ds, log=log)


def predictor(checkpoint_path: str, **kw) -> Predictor:
    """Load a trained model (framework dir or reference .pth)."""
    return Predictor.from_checkpoint(checkpoint_path, **kw)


def predict(checkpoint_path: str, points: np.ndarray, **kw) -> np.ndarray:
    """One-shot: checkpoint + (N, D) points -> (N,) predicted classes."""
    return predictor(checkpoint_path, **kw).predict(points)
