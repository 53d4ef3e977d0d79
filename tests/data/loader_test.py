"""Tests for the threaded batch loader."""
import threading
import time

import numpy as np
import pytest

from neuron_descriptions_tpu.data import loader


class Items:

    def __init__(self, n=32):
        self.n = n

    def __getitem__(self, index):
        return np.full((4,), index, np.float32)

    def __len__(self):
        return self.n


def _worker_threads():
    return [t for t in threading.enumerate()
            if t is not threading.main_thread()]


@pytest.mark.parametrize("num_workers", (0, 4))
def test_batches_complete_and_ordered(num_workers):
    batches = list(loader.Loader(Items(10), batch_size=4,
                                 num_workers=num_workers))
    assert len(batches) == 3
    np.testing.assert_array_equal(batches[0][:, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(batches[2][:, 0], [8, 9])


def test_indices_subset():
    batches = list(loader.Loader(Items(10), batch_size=2, num_workers=2,
                                 indices=[7, 1, 3]))
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0][:, 0], [7, 1])


def test_error_propagates():
    class Broken(Items):

        def __getitem__(self, index):
            if index == 5:
                raise RuntimeError("boom")
            return super().__getitem__(index)

    with pytest.raises(RuntimeError, match="boom"):
        list(loader.Loader(Broken(10), batch_size=2, num_workers=2))


def test_abandoned_iteration_does_not_leak_producer():
    """Round-3/4 finding: a consumer that stops early must not strand the
    producer thread on a full prefetch queue."""
    before = len(_worker_threads())
    it = iter(loader.Loader(Items(64), batch_size=2, num_workers=2,
                            prefetch=1))
    next(it)
    it.close()  # abandon mid-iteration -> GeneratorExit in the generator

    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if len(_worker_threads()) <= before:
            break
        time.sleep(0.05)
    assert len(_worker_threads()) <= before, "producer thread leaked"


def test_slow_consumer_with_full_prefetch_queue_terminates():
    """Review finding: the end-of-iteration sentinel must not be dropped
    when the prefetch queue is full (slow consumer, many batches)."""
    batches = []
    for batch in loader.Loader(Items(40), batch_size=2, num_workers=2,
                               prefetch=1):
        time.sleep(0.02)  # consumer slower than producer
        batches.append(batch)
    assert len(batches) == 20


def test_error_propagates_with_full_queue():
    class Broken(Items):

        def __getitem__(self, index):
            if index == 30:
                raise RuntimeError("late boom")
            return super().__getitem__(index)

    with pytest.raises(RuntimeError, match="late boom"):
        for _ in loader.Loader(Broken(40), batch_size=2, num_workers=2,
                               prefetch=1):
            time.sleep(0.02)
