"""Background host->device prefetch (SURVEY.md §7 primary metric;
VERDICT.md round-1 item 5).

The round-1 train loop materialized each batch (host-side gather + int16
quantize) and device_put it synchronously inside the step loop, serializing
host work with device compute.  DevicePrefetcher moves both onto a daemon
thread with a depth-2 queue: batch k+1's synthesis/disk-read and H2D
transfer overlap batch k's train step, so the device only ever waits when
the host is genuinely slower than the chip (and then by the minimum
possible amount).

jax.device_put is thread-safe and asynchronous: the queue holds device
arrays whose transfers are already in flight when the consumer dequeues.
"""

from __future__ import annotations

import queue
import threading


class DevicePrefetcher:
    """Iterate (batch, device_args) with materialization + H2D off-thread.

    batch_iter: yields loader Batch objects (e.g. BucketedLoader.epoch()).
    put_fn: Batch -> device args tuple (e.g. Trainer.put_batch).
    depth: queue depth; 2 = double buffering (one in compute, one in flight).
    """

    _DONE = object()

    def __init__(self, batch_iter, put_fn, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None

        def run():
            try:
                for batch in batch_iter:
                    self._q.put((batch, put_fn(batch)))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(
            target=run, daemon=True, name="neuralasr-prefetch"
        )
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                self._thread.join()
                if self._err is not None:
                    raise self._err
                return
            yield item
