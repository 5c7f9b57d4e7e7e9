"""Device mesh + sharding helpers.

TPU-native replacement for the reference's entire distributed stack
(mp.spawn / NCCL process groups / DDP / barriers,
scripts/train_ddp.py:26-52,84,118): one SPMD program compiled by XLA
over a ``jax.sharding.Mesh``. The batch is sharded over the ``data``
axis; parameters are replicated; gradient averaging becomes a psum XLA
inserts automatically and routes over ICI. A ``model`` axis is carried
for optional tensor-parallel sharding of the wide decoders (huge tier),
unused (size 1) by default.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded along the batch axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    return global_batch // mesh.shape["data"]
