"""Device prefetch — the host→device boundary.

TPU-native equivalent of the reference's side-CUDA-stream prefetchers
(``PrefetchedWrapper.prefetched_loader`` ``image_classification/
dataloaders.py:354-389``; DLRM ``dlrm/data/utils.py`` ``prefetcher``): keep
``size`` batches in flight so the H2D transfer of batch N+1 overlaps the
compute of batch N. ``jax.device_put`` is async, so a small deque of
already-put batches achieves the double-buffering without explicit streams.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Iterable, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["prefetch_to_device", "background"]


def background(it: Iterable[Any], depth: int = 3) -> Iterator[Any]:
    """Run an iterable's production on a worker thread, ``depth`` items ahead.

    The role of the reference's DALI worker processes / torch DataLoader
    workers (``dataloaders.py:354-409``): host-side decode and augmentation
    of batch N+1 overlap device compute of batch N. One thread suffices —
    file reads and the native data plane's ctypes call both release the GIL,
    and decode itself is already parallel on the plane's thread pool.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def produce():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface loader errors to the consumer
            q.put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def prefetch_to_device(
    it: Iterable[Any], mesh: Mesh | None = None, size: int = 2
) -> Iterator[Any]:
    """Yield batches placed on device, ``size`` batches ahead of the consumer.

    With a mesh, leaves are sharded along dim 0 over the ``data`` axis
    (replicated over model/sequence); without, they go to the default device.
    """
    queue: collections.deque = collections.deque()

    def put(batch):
        def place(x):
            x = np.asarray(x)
            # short tail batches (eval drop_last=False) may not divide the
            # data axis: place them unsharded and let jit reshard
            if (
                mesh is not None
                and x.ndim
                and x.shape[0] % mesh.shape.get("data", 1) == 0
            ):
                spec = P("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))
            return jax.device_put(x)

        return jax.tree_util.tree_map(place, batch)

    src = iter(it)
    try:
        for _ in range(size):
            queue.append(put(next(src)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(src)))
        except StopIteration:
            pass
        yield out
