"""Device-side input prefetch: overlap H2D of batch i+1 with step i.

The training loops are single-threaded Python: loader ``next()`` →
``shard_batch`` (device_put) → dispatch.  Dispatch is async, so some
overlap exists for free — but any host sync in the loop (printing a
loss, an epoch-end eval) stalls the *upload* of the next batch too, and
on transfer-bound hosts the H2D issue itself should never wait on the
consumer.  ``DevicePrefetcher`` moves the pull+put onto a background
thread with a bounded queue of device-resident batches, so host decode
(loader workers), H2D transfer, and device compute pipeline freely.

This replaces the reference's implicit overlap from
``DataLoader(num_workers=…, pin_memory)`` + CUDA async copies
(reference main.py:260-279, 589-606) with an explicit, inspectable
stage.  Depth 2 is enough: one batch in flight on the link, one ready.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator

_DONE = "done"
_ITEM = "item"
_ERROR = "error"


class DevicePrefetcher:
    """Iterate ``put(item)`` for items of ``iterator``, computed ahead.

    ``put`` runs on the background thread — give it the host→device work
    (build the batch dict, ``shard_batch``/``device_put``).  Order is
    preserved.  Exceptions from the iterator or ``put`` re-raise at the
    consumer's ``__next__``.  ``close()`` (also called on exhaustion and
    by ``__exit__``) stops the thread promptly even mid-``put``.
    """

    def __init__(
        self,
        iterator: Iterable[Any],
        put: Callable[[Any], Any] = lambda x: x,
        depth: int = 2,
    ):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(iter(iterator), put), daemon=True,
            name="device-prefetch",
        )
        self._thread.start()

    def _offer(self, msg) -> bool:
        """Blocking put that aborts when the consumer closed us."""
        while not self._stop.is_set():
            try:
                self._q.put(msg, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self, it: Iterator[Any], put) -> None:
        try:
            for item in it:
                if self._stop.is_set():
                    return
                if not self._offer((_ITEM, put(item))):
                    return
            self._offer((_DONE, None))
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            self._offer((_ERROR, e))

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        msg, payload = self._q.get()
        if msg == _ITEM:
            return payload
        if msg == _DONE:
            self.close()
            raise StopIteration
        self.close()
        raise payload

    def close(self) -> None:
        """Stop the worker and drop queued batches (idempotent)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()
