"""Host -> device input pipeline.

The reference leans on 32 torch DataLoader worker processes
(neo360/model.py:1027-1034). Here the host side is a single lightweight
sampler (the heavy lifting was removed at the source: NeRDS360AE only
generates the ~500 rays it actually uses), plus a background prefetch thread
that keeps `size` batches in flight so device steps never wait on PNG
decoding or ray math.

The prefetcher shuts down cleanly: consumers that stop early MUST call
`.close()` (or exhaust it) — a producer thread left blocked on a full queue
keeps issuing `jax.device_put` races against the main thread's work; we
observed it wedging a subsequent `jax.device_get` indefinitely.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


def train_iterator(dataset, seed: int = 0) -> Iterator:
    """Infinite iterator of training samples from a NeRDS360AE-style
    dataset (anything with .sample_train(rng))."""
    rng = np.random.default_rng(seed)
    while True:
        yield dataset.sample_train(rng)


class _Prefetcher:
    _SENTINEL = object()

    def __init__(self, iterator: Iterator, size: int, place_fn=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=size)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._place = place_fn or jax.device_put
        self._thread = threading.Thread(
            target=self._produce, args=(iterator,), daemon=True)
        self._thread.start()

    def _produce(self, iterator):
        try:
            for item in iterator:
                item = self._place(item)
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:
            # surface producer failures to the consumer: swallowing them
            # silently ENDS the stream (a crashed sampler would truncate a
            # training run / eval sweep with no error)
            self._exc = e
        finally:
            # the sentinel must be delivered even when the queue is full at
            # exhaustion (slow consumer, e.g. run_eval rendering each view):
            # a dropped sentinel leaves the consumer blocked in q.get()
            # forever after the last item. Same stop-aware blocking put as
            # the item path above.
            while not self._stop.is_set():
                try:
                    self._q.put(self._SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            # terminate repeated iteration deterministically: without this,
            # a second __next__ after the sentinel blocks on the empty queue
            self._stop.set()
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def close(self):
        """Stop the producer thread and release its queue slot."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       place_fn=None) -> _Prefetcher:
    """Run `iterator` in a daemon thread, place each item on device (default
    jax.device_put; pass `place_fn` for mesh-sharded placement, e.g.
    parallel.sharding.shard_staged_batch), keep `size` items buffered.
    Call .close() if you stop consuming early."""
    return _Prefetcher(iterator, size, place_fn)
