"""Host -> device input pipeline.

The reference leans on 32 torch DataLoader worker processes
(neo360/model.py:1027-1034). Here the host side is a single lightweight
sampler (the heavy lifting was removed at the source: NeRDS360AE only
generates the ~500 rays it actually uses), plus a background prefetch thread
that keeps `size` batches in flight so device steps never wait on PNG
decoding or ray math.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator

import jax
import numpy as np


def train_iterator(dataset, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite iterator of training samples from a NeRDS360AE-style
    dataset (anything with .sample_train(rng))."""
    rng = np.random.default_rng(seed)
    while True:
        yield dataset.sample_train(rng)


def prefetch_to_device(iterator: Iterator, size: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread, jax.device_put each item, keep
    `size` items buffered."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
