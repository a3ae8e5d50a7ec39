"""Prefetching generator tests: ordering, completion, error propagation."""

import time

import pytest

from lrp_imagecaptioning_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_finishes():
    out = list(prefetch(iter(range(50)), max_queue_size=4))
    assert out == list(range(50))


def test_prefetch_overlaps_production():
    """The producer thread runs ahead of the consumer: after a grace period
    every item is buffered, so draining never waits on a producer sleep.

    Deadline-based instead of a fixed sleep + wall-clock bound: on a loaded
    1-core host the old `sleep(0.15); drain < 0.05s` version flaked when the
    OS delayed either thread (observed 0.061 s in a full-suite run). Waiting
    until the queue actually holds all items pins the same overlap property
    (items buffered while the consumer is idle) without racing the scheduler;
    the drain bound stays as a sanity ceiling only."""
    def slow_gen():
        for i in range(5):
            time.sleep(0.02)
            yield i

    g = prefetch(slow_gen(), max_queue_size=10)
    deadline = time.perf_counter() + 10.0
    while g._queue.qsize() < 5 and time.perf_counter() < deadline:
        time.sleep(0.01)
    assert g._queue.qsize() >= 5, "producer never ran ahead of the consumer"
    t0 = time.perf_counter()
    out = list(g)
    assert out == list(range(5))
    assert time.perf_counter() - t0 < 2.0  # drained from the buffer, no 0.02s-per-item production wait


def test_prefetch_propagates_errors():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    g = prefetch(bad_gen())
    assert next(g) == 1
    with pytest.raises(ValueError, match="boom"):
        next(g)


def test_prefetch_stop():
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    g = prefetch(infinite(), max_queue_size=2)
    assert next(g) == 0
    g.stop()  # must not hang
