"""Host -> device prefetch (SURVEY.md §7 step 3).

The reference's loops block on `.to(device)` every batch
(MusicTransformer/train.py:259-260). Here a background thread runs the
host-side batch pipeline (crop/pack in numpy) while the device computes,
and `jax.device_put` (optionally with a NamedSharding) stages the next
`size` batches ahead — dispatch is async, so transfers overlap compute.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding: Optional[Any] = None) -> Iterator:
    """Yield device-resident batches, keeping `size` in flight.

    `sharding`: optional jax.sharding.Sharding (or pytree-of) applied per
    leaf — pass `parallel.mesh.batch_sharding(mesh)` for DP input
    sharding; None puts on the default device.
    """

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            raise item  # the pipeline's real error, not a silent stream end
        yield item


def sliding_prefetch(iterator: Iterable, size: int = 2) -> Iterator:
    """Synchronous variant (no thread): keep `size` device_puts in flight
    using dispatch asynchrony only — deterministic, test-friendly."""
    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(jax.tree.map(jax.device_put, next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.tree.map(jax.device_put, next(it)))
        except StopIteration:
            pass
        yield out
