"""HDF5 event storage.

Schema contract (reference ``PointCloudDataset``, pcs.py:20-42): two files,
one with dataset ``data`` of per-event flat float arrays that reshape to
``(N, 4)`` — columns x, y, z, e (pcs.py:33-34) — and one with dataset
``labels`` of per-event int arrays ``(N,)`` (pcs.py:35). Events are
variable-length (ragged).

Unlike the reference (which hands file handles to 32 DataLoader worker
processes), reads here happen in the host process / prefetch threads; HDF5
chunk caching plus the bucketed batcher make that the cheap part of the
pipeline.
"""

from __future__ import annotations

import os
from typing import Iterable

import h5py
import numpy as np


class PointCloudDataset:
    """Map-style view over the two event files.

    ``ds[idx] -> (points (N,4) float32, labels (N,) int64)`` —
    the reference ``__getitem__`` contract (pcs.py:30-36).
    """

    def __init__(self, data_path: str, label_path: str, feature_dim: int = 4):
        self.data_file = h5py.File(data_path, "r")
        self.label_file = h5py.File(label_path, "r")
        self.feature_dim = feature_dim
        self.num_events = len(self.data_file["data"])
        if len(self.label_file["labels"]) != self.num_events:
            raise ValueError(
                f"data has {self.num_events} events but labels has "
                f"{len(self.label_file['labels'])}"
            )

    def __len__(self) -> int:
        return self.num_events

    def __getitem__(self, idx: int):
        points = np.asarray(
            self.data_file["data"][idx], dtype=np.float32
        ).reshape(-1, self.feature_dim)
        labels = np.asarray(self.label_file["labels"][idx], dtype=np.int64)
        if labels.shape[0] != points.shape[0]:
            raise ValueError(
                f"event {idx}: {points.shape[0]} points vs "
                f"{labels.shape[0]} labels"
            )
        return points, labels

    def num_points(self, idx: int) -> int:
        """Point count without materializing features (for bucketing)."""
        return int(self.data_file["data"][idx].shape[0] // self.feature_dim)

    def close(self) -> None:
        self.data_file.close()
        self.label_file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_event_files(
    data_path: str,
    label_path: str,
    events: Iterable[tuple[np.ndarray, np.ndarray]],
) -> int:
    """Write ragged events in the reference schema (flat float32 'data',
    int64 'labels', both variable-length). Returns event count."""
    os.makedirs(os.path.dirname(os.path.abspath(data_path)), exist_ok=True)
    flat_t = h5py.vlen_dtype(np.float32)
    lab_t = h5py.vlen_dtype(np.int64)
    events = list(events)
    with h5py.File(data_path, "w") as fd, h5py.File(label_path, "w") as fl:
        d = fd.create_dataset("data", (len(events),), dtype=flat_t)
        l = fl.create_dataset("labels", (len(events),), dtype=lab_t)
        for i, (pts, labs) in enumerate(events):
            d[i] = np.asarray(pts, np.float32).reshape(-1)
            l[i] = np.asarray(labs, np.int64)
    return len(events)
