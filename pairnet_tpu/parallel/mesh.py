"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP stack
(ref: SURVEY.md §5.8 — init_dist, MMDistributedDataParallel, bucket
allreduce): a ``jax.sharding.Mesh`` with a ``data`` axis; parameters are
replicated and the batch is sharded, so XLA inserts the gradient psum over
ICI automatically. A ``model`` axis is provisioned for tensor-parallel
sharding of large backbones (Swin-B) even though the reference has
data-parallel only (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
