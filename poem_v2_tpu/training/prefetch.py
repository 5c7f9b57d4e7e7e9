"""Device-feed prefetching (input-pipeline double buffering).

The reference overlaps input loading with compute through torch
DataLoader worker processes + pinned-memory H2D copies (train_ddp.py
num_workers). The TPU-native equivalent: JAX device transfers are
asynchronous, so keeping ``size`` sharded batches in flight pipelines
host->HBM DMA of batch n+1 under the jitted step of batch n. This is
the difference between the measured 191 ms device-resident step and the
~1.1 s tunnel-fed step (ROUND_NOTES.md) on any link slower than local
PCIe/DMA.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterable, Iterator

import jax.numpy as jnp


def prefetch_to_device(
    batches: Iterable[Dict[str, Any]],
    mesh,
    size: int = 2,
    to_device_fn=None,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Yield batches already sharded over ``mesh``, keeping ``size``
    transfers in flight ahead of the consumer."""
    from ..parallel.mesh import shard_batch

    if to_device_fn is None:
        from .trainer import Trainer

        to_device_fn = Trainer._to_device_batch

    queue = collections.deque()
    it = iter(batches)

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(it)
            except StopIteration:
                return
            # device_put is async: the copy starts now and overlaps with
            # the step running on the previously yielded batch
            queue.append(shard_batch(to_device_fn(batch), mesh))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
