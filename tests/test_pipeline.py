"""Host batching pipeline: threaded fetch + background prefetch semantics."""

import time

import numpy as np
import pytest

from qea_ocr_tpu.data.pipeline import (
    batch_iterator, default_num_workers, prefetch_iterator,
)


class SlowDataset:
    """Index-addressable dataset whose fetch sleeps (simulates PNG decode)."""

    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return i


def collate_ids(samples):
    return list(samples)


def test_threaded_fetch_preserves_order_and_partition():
    ds = SlowDataset(32)
    sync = [b for b in batch_iterator(ds, 4, collate_ids, shuffle=True,
                                      seed=7, epoch=3)]
    thr = [b for b in batch_iterator(ds, 4, collate_ids, shuffle=True,
                                     seed=7, epoch=3, num_workers=4)]
    assert sync == thr  # same shuffle, same batch contents, same order


def test_prefetch_matches_sync():
    ds = SlowDataset(16)
    sync = [b for b in batch_iterator(ds, 4, collate_ids, shuffle=False)]
    pre = [b for b in batch_iterator(ds, 4, collate_ids, shuffle=False,
                                     prefetch=2)]
    assert sync == pre


def test_threaded_fetch_is_concurrent():
    # Compare against the measured serial time so the bound holds on a
    # loaded machine: 8-way fetch of 20ms sleeps should land well under
    # half the serial wall-clock.
    ds = SlowDataset(16, delay=0.02)
    t0 = time.perf_counter()
    out = [b for b in batch_iterator(ds, 8, collate_ids, shuffle=False)]
    serial_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = [b for b in batch_iterator(ds, 8, collate_ids, shuffle=False,
                                     num_workers=8)]
    dt = time.perf_counter() - t0
    assert len(out) == 2
    assert dt < 0.5 * serial_dt, (
        f"threaded fetch not concurrent: {dt:.3f}s vs serial {serial_dt:.3f}s")


def test_prefetch_iterator_propagates_exceptions():
    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        list(it)


def test_prefetch_producer_stops_when_consumer_abandons():
    import threading

    produced = []

    def gen():
        for i in range(100000):
            produced.append(i)
            yield i

    it = prefetch_iterator(gen(), depth=1)
    assert next(it) == 0
    it.close()  # consumer abandons mid-stream
    deadline = time.time() + 5.0
    while time.time() < deadline and any(
            t.name == "qea-prefetch" and t.is_alive()
            for t in threading.enumerate()):
        time.sleep(0.05)
    assert not any(t.name == "qea-prefetch" and t.is_alive()
                   for t in threading.enumerate()), \
        "producer thread did not exit after consumer close"
    assert len(produced) < 100000  # it stopped early, not after draining


def test_default_num_workers_env(monkeypatch):
    monkeypatch.setenv("QEA_NUM_WORKERS", "0")
    assert default_num_workers() == 0
    monkeypatch.setenv("QEA_NUM_WORKERS", "7")
    assert default_num_workers() == 7


def test_indices_subset_respected_with_workers():
    ds = SlowDataset(100)
    idx = np.arange(10, 30)
    batches = [b for b in batch_iterator(ds, 5, collate_ids, shuffle=False,
                                         indices=idx, num_workers=3)]
    flat = [i for b in batches for i in b]
    assert flat == list(range(10, 30))
