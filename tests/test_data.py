"""Data layer: collate semantics, bucketing, class stats, HDF5 roundtrip."""

import numpy as np
import pytest

from pcseg_tpu.data.batching import BucketBatcher, pad_events, pick_bucket
from pcseg_tpu.data.class_stats import scan_classes
from pcseg_tpu.data.hdf5 import PointCloudDataset, write_event_files
from pcseg_tpu.data.synthetic import synthetic_events


def test_pad_events_matches_reference_collate(rng):
    """Reference collate contract (pcs.py:44-63): zero-padded points,
    -1-padded labels, bool masks."""
    events = [
        (rng.normal(size=(10, 4)).astype(np.float32), np.arange(10) % 3),
        (rng.normal(size=(7, 4)).astype(np.float32), np.arange(7) % 3),
    ]
    points, labels, masks = pad_events(events, max_points=16)
    assert points.shape == (2, 16, 4)
    assert labels.shape == (2, 16)
    assert masks.dtype == bool
    np.testing.assert_array_equal(points[1, 7:], 0.0)
    np.testing.assert_array_equal(labels[1, 7:], -1)
    assert masks[0, :10].all() and not masks[0, 10:].any()
    np.testing.assert_array_equal(points[0, :10], events[0][0])
    np.testing.assert_array_equal(labels[1, :7], events[1][1])


def test_pad_events_batch_dim_padding(rng):
    events = [(rng.normal(size=(5, 4)).astype(np.float32), np.zeros(5, np.int64))]
    points, labels, masks = pad_events(events, 8, batch_size=4)
    assert points.shape == (4, 8, 4)
    assert not masks[1:].any()
    assert (labels[1:] == -1).all()


def test_pick_bucket():
    assert pick_bucket(1, (256, 512)) == 256
    assert pick_bucket(256, (256, 512)) == 256
    assert pick_bucket(257, (256, 512)) == 512
    with pytest.raises(ValueError):
        pick_bucket(513, (256, 512))


def test_bucket_batcher_covers_everything(small_events):
    batcher = BucketBatcher(
        small_events, batch_size=8, buckets=(256, 512), shuffle=True, seed=1
    )
    seen_points = 0
    for points, labels, masks in batcher:
        assert points.shape[0] == 8
        assert points.shape[1] in (256, 512)
        seen_points += int(masks.sum())
    expected = sum(e[0].shape[0] for e in small_events)
    assert seen_points == expected
    assert len(batcher) == 4

    # epochs reshuffle but still cover everything
    seen2 = sum(int(m.sum()) for _, _, m in batcher)
    assert seen2 == expected


def test_class_stats_reference_formula():
    """Weights per pcs.py:167-183: max_count/count, x2 on class 2,
    normalized to sum to num_classes."""
    events = []
    counts = {0: 800, 1: 150, 2: 50}
    for c, n in counts.items():
        events.append(
            (np.zeros((n, 4), np.float32), np.full(n, c, np.int64))
        )
    stats = scan_classes(events, scan_events=10)
    assert stats.num_classes == 3
    raw = np.array([800 / 800, 800 / 150, (800 / 50) * 2.0])
    expected = raw * 3 / raw.sum()
    np.testing.assert_allclose(stats.weights, expected, rtol=1e-6)
    assert abs(stats.weights.sum() - 3.0) < 1e-5


def test_class_stats_scan_limit():
    events = [
        (np.zeros((5, 4), np.float32), np.full(5, i % 2, np.int64))
        for i in range(10)
    ] + [(np.zeros((5, 4), np.float32), np.full(5, 2, np.int64))]
    stats = scan_classes(events, scan_events=10)  # never sees class 2
    assert stats.num_classes == 2  # pcs.py:153 rule (documented hazard)


def test_hdf5_roundtrip(tmp_path, small_events):
    dp, lp = str(tmp_path / "d.h5"), str(tmp_path / "l.h5")
    n = write_event_files(dp, lp, small_events)
    assert n == len(small_events)
    with PointCloudDataset(dp, lp) as ds:
        assert len(ds) == n
        for i in (0, n // 2, n - 1):
            pts, labs = ds[i]
            np.testing.assert_allclose(pts, small_events[i][0], rtol=1e-6)
            np.testing.assert_array_equal(labs, small_events[i][1])
            assert ds.num_points(i) == small_events[i][0].shape[0]


def test_synthetic_events_schema():
    events = list(synthetic_events(5, num_classes=4, seed=1))
    assert len(events) == 5
    for pts, labs in events:
        assert pts.dtype == np.float32 and pts.shape[1] == 4
        assert labs.dtype == np.int64 and labs.shape == (pts.shape[0],)
        assert labs.min() >= 0 and labs.max() < 4


def test_prefetcher_yields_all_and_reiterates(small_events):
    from pcseg_tpu.data.prefetch import prefetch

    batcher = BucketBatcher(small_events, batch_size=8, buckets=(512,))
    pf = prefetch(batcher, depth=2)
    n1 = sum(1 for _ in pf)
    n2 = sum(1 for _ in pf)  # second epoch works (fresh thread)
    assert n1 == n2 == len(batcher)


def test_prefetcher_propagates_errors():
    from pcseg_tpu.data.prefetch import prefetch

    def bad():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch(bad(), depth=1))


def test_split_indices_sizes_match_reference():
    """train = int(0.8 * n), val = remainder (pcs.py:192-194): n=11 must
    split 8/3, not round()'s 9/2."""
    from pcseg_tpu.train.loop import split_indices

    tr, va = split_indices(11, 0.2, seed=0)
    assert (len(tr), len(va)) == (8, 3)
    assert sorted(np.concatenate([tr, va]).tolist()) == list(range(11))
