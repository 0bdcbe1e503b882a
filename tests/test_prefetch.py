"""DevicePrefetcher: ordering, completeness, and error propagation."""

import time

import pytest

from neuralasr_tpu.data.prefetch import DevicePrefetcher


def test_preserves_order_and_completeness():
    items = list(range(20))
    out = list(DevicePrefetcher(iter(items), lambda x: x * 10, depth=2))
    assert [b for b, _ in out] == items
    assert [d for _, d in out] == [x * 10 for x in items]


def test_overlaps_producer_with_consumer():
    """With depth-2 buffering, a slow producer and a slow consumer overlap:
    total wall time is ~max(sum_produce, sum_consume), not the sum."""
    n, delay = 8, 0.03

    def slow_put(x):
        time.sleep(delay)
        return x

    t0 = time.time()
    for _b, _d in DevicePrefetcher(iter(range(n)), slow_put, depth=2):
        time.sleep(delay)  # consumer work
    wall = time.time() - t0
    assert wall < 1.7 * n * delay, wall  # serial would be ~2*n*delay


def test_producer_exception_propagates():
    def bad_iter():
        yield 1
        raise RuntimeError("boom in producer")

    it = iter(DevicePrefetcher(bad_iter(), lambda x: x))
    assert next(it)[0] == 1
    with pytest.raises(RuntimeError, match="boom in producer"):
        list(it)


def test_put_exception_propagates():
    def bad_put(x):
        if x == 3:
            raise ValueError("boom in put")
        return x

    with pytest.raises(ValueError, match="boom in put"):
        list(DevicePrefetcher(iter(range(5)), bad_put))


def test_close_releases_producer_on_early_exit():
    """Abandoning iteration + close() must stop the producer thread and
    drop buffered items instead of parking forever on the full queue."""
    produced = []

    def tracking_put(x):
        produced.append(x)
        return x

    pf = DevicePrefetcher(iter(range(100)), tracking_put, depth=2)
    it = iter(pf)
    next(it)  # consume one, then abandon
    pf.close()
    assert not pf._thread.is_alive()
    assert len(produced) < 100  # producer stopped early
