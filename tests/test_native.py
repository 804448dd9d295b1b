"""Native C++ host library: build + byte parity with the numpy path."""

import numpy as np
import pytest

from pcseg_tpu.data.batching import BucketBatcher, pad_events
from pcseg_tpu.native.build import load_native


def test_native_builds():
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain in this environment")
    assert hasattr(lib, "pack_batch")


def test_pack_batch_matches_numpy(rng, small_events):
    if load_native() is None:
        pytest.skip("no native lib")
    events = small_events[:6]
    a = pad_events(events, 512, batch_size=8, use_native=True)
    b = pad_events(events, 512, batch_size=8, use_native=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pack_batch_oversize_raises(rng):
    events = [(rng.normal(size=(100, 4)).astype(np.float32),
               np.zeros(100, np.int64))]
    with pytest.raises(ValueError):
        pad_events(events, 64)


def test_window_sort_matches_numpy(rng):
    if load_native() is None:
        pytest.skip("no native lib")
    lengths = rng.integers(1, 1000, size=300).astype(np.int32)
    order = rng.permutation(300).astype(np.int64)
    got = BucketBatcher._window_sort(order.copy(), lengths, 64)
    chunks = []
    for s in range(0, len(order), 64):
        win = order[s : s + 64]
        chunks.append(win[np.argsort(lengths[win], kind="stable")])
    want = np.concatenate(chunks)
    np.testing.assert_array_equal(got, want)
