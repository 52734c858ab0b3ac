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


def background_iterator(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread with a bounded queue of `depth` items.

    Host-side decode/encode work (tar IO, JPEG decode, tokenization) overlaps
    the device step this way: the producer thread fills the queue while the
    main thread blocks inside jax fetches (which release the GIL, and the
    native decode kernels release it too). This is the role torch DataLoader
    workers play for the reference (src_distributed/utils.py:62) without
    fork-based worker processes.

    Exceptions in the producer re-raise in the consumer; the thread is a
    daemon, so an abandoned iterator cannot hang interpreter shutdown.
    """
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    _END = object()

    def produce():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            q.put((_END, e))
            return
        q.put((_END, None))

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
            if item[1] is not None:
                raise item[1]
            return
        yield item
