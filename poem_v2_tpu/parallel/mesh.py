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

from typing import Any, Optional, Sequence

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
    elif data * model < n:
        # explicitly-sized mesh on a larger device pool: take a prefix
        # (e.g. --mesh_data 1 for a single-device run on the 8-device
        # virtual CPU mesh the test tier forces)
        devices = devices[: data * model]
        n = len(devices)
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


# ---- tensor-parallel parameter sharding -----------------------------------
#
# The reference has no TP (largest tier fits one GPU — SURVEY §2.3); on TPU
# a `model` mesh axis is nearly free to support, so wide tiers (large/huge,
# 512/1024-dim decoders) can shard their big dense kernels across it.
# Rule-based: any kernel whose last dim is a multiple of the axis size and
# at least `min_dim` is sharded on that last (output-feature) dim; XLA then
# inserts the matching all-gathers/reduce-scatters over ICI. Biases and
# small/odd params stay replicated.

def infer_param_shardings(params, mesh: Mesh, min_dim: int = 256):
    """PyTree of NamedShardings: TP-shard wide kernels on the model axis."""
    n_model = mesh.shape["model"]
    rep = replicated(mesh)
    if n_model <= 1:
        return jax.tree_util.tree_map(lambda _: rep, params)

    def rule(path, x):
        if x.ndim >= 2 and x.shape[-1] >= min_dim and x.shape[-1] % n_model == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), "model"))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, min_dim: int = 256):
    """Place params per :func:`infer_param_shardings`."""
    shardings = infer_param_shardings(params, mesh, min_dim)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
