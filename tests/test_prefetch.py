"""Prefetching generator tests: ordering, completion, error propagation."""

import time

import pytest

from lrp_imagecaptioning_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_finishes():
    out = list(prefetch(iter(range(50)), max_queue_size=4))
    assert out == list(range(50))


def test_prefetch_overlaps_production():
    def slow_gen():
        for i in range(5):
            time.sleep(0.02)
            yield i

    g = prefetch(slow_gen(), max_queue_size=10)
    time.sleep(0.15)  # producer should have buffered everything by now
    t0 = time.perf_counter()
    out = list(g)
    assert out == list(range(5))
    assert time.perf_counter() - t0 < 0.05


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
