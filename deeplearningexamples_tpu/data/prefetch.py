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
from typing import Any, Iterable, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["prefetch_to_device"]


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
            if mesh is not None:
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
