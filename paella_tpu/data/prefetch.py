"""Host->device prefetching: overlap input copy with the training step.

The reference relies on torch DataLoader's pin_memory + worker processes
(reference: src_distributed/utils.py:62). The JAX equivalent is explicit:
device_put the NEXT batch (optionally sharded over the mesh) while the current
step runs, so the copy rides under the compute.
"""
from __future__ import annotations

import collections
from typing import Callable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Yield items from `iterator` with up to `size` batches resident on device.

    transform: host-side fn applied before the device_put (e.g. encode_batch).
    """
    queue = collections.deque()

    def put(item):
        if transform is not None:
            item = transform(item)
        if sharding is not None:
            item = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), item)
        else:
            item = jax.tree_util.tree_map(jax.device_put, item)
        queue.append(item)

    for item in iterator:
        put(item)
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
