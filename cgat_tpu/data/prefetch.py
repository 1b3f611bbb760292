"""Host-side batch prefetch: collate ahead of the device.

On the axon TPU runtime every train-step dispatch is synchronous (the
process enters sync mode at the first D2H read, docs/PERFORMANCE.md), so
host collation time adds directly to step time when done inline. Wrapping a
loader in :class:`PrefetchLoader` moves collation (pure numpy) onto a
background thread that stays ``depth`` batches ahead — the reference got the
same overlap from torch DataLoader workers (lightning_module.py:357-411).
"""
from __future__ import annotations

import queue
import threading


class PrefetchLoader:
    """Wrap any loader (GraphLoader / streaming / stacked-group variants);
    delegates ``set_epoch``/``__len__`` and re-exposes ``last_counts``
    synchronously with each yielded batch."""

    def __init__(self, inner, depth: int = 2):
        self.inner = inner
        self.depth = depth
        self.last_counts = {"edges": 0, "graphs": 0}

    def __len__(self):
        return len(self.inner)

    def set_epoch(self, epoch: int) -> None:
        self.inner.set_epoch(epoch)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        DONE, ERR = object(), object()

        def produce():
            try:
                for batch in self.inner:
                    q.put((batch,
                           dict(getattr(self.inner, "last_counts",
                                        {"edges": 0, "graphs": 0}))))
                q.put(DONE)
            except BaseException as e:  # surfaced in the consumer
                q.put((ERR, e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            if isinstance(item, tuple) and item[0] is ERR:
                raise item[1]
            batch, counts = item
            self.last_counts = counts
            yield batch
        t.join()
