"""Ragged -> static-shape batching.

The reference pads every batch to its own max point count (``collate_fn``,
pcs.py:44-63): points zero-padded, labels padded with -1, bool validity
masks. That gives a different tensor shape every batch — fine for eager
PyTorch, poison for XLA (one compile per shape).

TPU-native replacement (SURVEY.md §7 hard-part 1): pad the per-batch max up
to a small fixed set of bucket lengths, so the whole run compiles a handful
of programs. The batch dimension is likewise always full (short final
batches are padded with all-masked rows), so B is static too and divisible
by the mesh's data axis.

Behavioral note: padded positions still flow through BN / the global pool
exactly like reference padding does; bucketing only changes HOW MUCH
padding there is (reference numerics already depend on that via its
batch-max rule — see SURVEY.md §2.2 quirks).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

DEFAULT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"event with {n} points exceeds largest bucket {buckets[-1]}; "
        "raise data.buckets"
    )


def pad_events(
    events: Sequence[tuple[np.ndarray, np.ndarray]],
    max_points: int,
    batch_size: Optional[int] = None,
    feature_dim: int = 4,
    use_native: bool = True,
):
    """Pad a list of ragged events to (B, max_points, ...) dense arrays.

    Returns (points f32 (B,M,D), labels i64 (B,M) with -1 padding,
    masks bool (B,M)) — the reference collate contract (pcs.py:63) at a
    static shape. ``batch_size`` > len(events) adds fully-masked rows.

    The packing pass goes through the native C++ packer
    (native/collate.cpp) when it is buildable; the numpy fallback is
    byte-identical.
    """
    b = batch_size if batch_size is not None else len(events)
    if use_native:
        out = _pad_events_native(events, max_points, b, feature_dim)
        if out is not None:
            return out
    points = np.zeros((b, max_points, feature_dim), np.float32)
    labels = np.full((b, max_points), -1, np.int64)
    masks = np.zeros((b, max_points), bool)
    for i, (pts, labs) in enumerate(events):
        n = pts.shape[0]
        if n > max_points:
            raise ValueError(f"event has {n} points > max_points {max_points}")
        points[i, :n] = pts
        labels[i, :n] = labs
        masks[i, :n] = True
    return points, labels, masks


def _pad_events_native(events, max_points, batch_size, feature_dim):
    import ctypes

    from pcseg_tpu.native.build import load_native

    lib = load_native()
    if lib is None:
        return None
    n_points = np.asarray([e[0].shape[0] for e in events], np.int32)
    if len(events) and (n_points > max_points).any():
        raise ValueError(
            f"event has {n_points.max()} points > max_points {max_points}"
        )
    pts_flat = (
        np.concatenate([np.asarray(e[0], np.float32).reshape(-1) for e in events])
        if events else np.zeros(0, np.float32)
    )
    lab_flat = (
        np.concatenate([np.asarray(e[1], np.int64).reshape(-1) for e in events])
        if events else np.zeros(0, np.int64)
    )
    points = np.empty((batch_size, max_points, feature_dim), np.float32)
    labels = np.empty((batch_size, max_points), np.int64)
    masks = np.empty((batch_size, max_points), np.uint8)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.pack_batch(
        p(pts_flat, ctypes.c_float),
        p(lab_flat, ctypes.c_int64),
        p(n_points, ctypes.c_int32),
        len(events),
        batch_size,
        max_points,
        feature_dim,
        p(points, ctypes.c_float),
        p(labels, ctypes.c_int64),
        p(masks, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError("native pack_batch failed (size mismatch)")
    return points, labels, masks.astype(bool)


class BucketBatcher:
    """Iterate a dataset as static-shape batches.

    Groups a (possibly shuffled) index order into fixed-size batches, pads
    each to the smallest bucket >= its max point count. With
    ``bucket_by_length=True``, indices are pre-sorted by point count inside
    a large shuffle window so batches are length-homogeneous (less padding
    waste) while remaining stochastic across epochs.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        indices: Optional[np.ndarray] = None,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        bucket_by_length: bool = True,
        window_batches: int = 32,
        feature_dim: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.indices = (
            np.arange(len(dataset)) if indices is None else np.asarray(indices)
        )
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.bucket_by_length = bucket_by_length
        self.window = window_batches * batch_size
        self.feature_dim = feature_dim
        self.epoch = 0
        self._lengths: Optional[dict[int, int]] = None

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _length_of(self, idx: int) -> int:
        if self._lengths is None:
            self._lengths = {}
        if idx not in self._lengths:
            if hasattr(self.dataset, "num_points"):
                self._lengths[idx] = self.dataset.num_points(idx)
            else:
                self._lengths[idx] = self.dataset[idx][0].shape[0]
        return self._lengths[idx]

    def _epoch_order(self) -> np.ndarray:
        order = self.indices.copy()
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        if self.bucket_by_length and len(order):
            lengths = np.asarray(
                [self._length_of(int(i)) for i in range(len(self.dataset))],
                np.int32,
            )
            order = self._window_sort(order.astype(np.int64), lengths, self.window)
        return order

    @staticmethod
    def _window_sort(
        order: np.ndarray, lengths: np.ndarray, window: int
    ) -> np.ndarray:
        from pcseg_tpu.native.build import load_native

        lib = load_native()
        if lib is not None:
            import ctypes

            out = np.ascontiguousarray(order, np.int64)
            lib.bucket_sort_windows(
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(out),
                np.int64(window),
            )
            return out
        chunks = []
        for s in range(0, len(order), window):
            win = order[s : s + window]
            chunks.append(win[np.argsort(lengths[win], kind="stable")])
        return np.concatenate(chunks)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        self.epoch += 1
        bs = self.batch_size
        stop = len(order) - (len(order) % bs) if self.drop_last else len(order)
        for s in range(0, stop, bs):
            batch_idx = order[s : s + bs]
            events = [self.dataset[int(i)] for i in batch_idx]
            max_n = max(e[0].shape[0] for e in events)
            bucket = pick_bucket(max_n, self.buckets)
            yield pad_events(
                events, bucket, batch_size=bs, feature_dim=self.feature_dim
            )
