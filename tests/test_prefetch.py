"""DevicePrefetcher unit semantics: order, errors, early close."""

import threading
import time

import pytest

from cp2_tpu.data.prefetch import DevicePrefetcher


def test_order_preserved_and_put_applied():
    out = list(DevicePrefetcher(range(20), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(20)]


def test_exhaustion_stops_iteration_and_joins_thread():
    pf = DevicePrefetcher(range(3))
    assert list(pf) == [0, 1, 2]
    with pytest.raises(StopIteration):
        next(pf)
    assert not pf._thread.is_alive()


def test_iterator_exception_propagates():
    def gen():
        yield 1
        raise RuntimeError("loader died")

    pf = DevicePrefetcher(gen(), depth=1)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        # depth 1: the error may sit behind nothing or one more item
        next(pf)
        next(pf)


def test_put_exception_propagates():
    def bad_put(x):
        if x == 2:
            raise ValueError("H2D failed")
        return x

    pf = DevicePrefetcher(range(5), bad_put, depth=2)
    got = []
    with pytest.raises(ValueError, match="H2D failed"):
        for item in pf:
            got.append(item)
    assert got == [0, 1]


def test_close_mid_stream_stops_worker_promptly():
    started = threading.Event()

    def slow_gen():
        for i in range(1000):
            started.set()
            yield i

    pf = DevicePrefetcher(slow_gen(), lambda x: x, depth=2)
    started.wait(timeout=5)
    assert next(pf) == 0
    pf.close()
    assert not pf._thread.is_alive()
    with pytest.raises(StopIteration):
        next(pf)


def test_worker_overlaps_with_consumer():
    """While the consumer is busy, the worker stages the next batches."""
    staged = []

    def put(x):
        staged.append(x)
        return x

    pf = DevicePrefetcher(range(10), put, depth=2)
    first = next(pf)
    assert first == 0
    deadline = time.time() + 5
    # without touching the consumer again, the worker should have staged
    # ahead (up to the queue depth + one in-flight put)
    while len(staged) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(staged) >= 3
    pf.close()


def test_depth_validation():
    with pytest.raises(ValueError):
        DevicePrefetcher(range(3), depth=0)
