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


def init_distributed() -> None:
    """Multi-host init (counterpart of init_dist, ref: tools/train.py:169-176).

    On a multi-host TPU slice, call once per process before any jax use;
    single-host (this environment) is a no-op.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    ) > 1:
        jax.distributed.initialize()


def shard_dataset_indices(n_items: int, seed: int, epoch: int):
    """Per-host disjoint shard of dataset indices (counterpart of the
    reference's per-rank DistributedSampler semantics): shuffle with a
    common seed, split contiguously across processes."""
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(n_items)
    p = jax.process_index()
    n = jax.process_count()
    per = n_items // n
    return order[p * per : (p + 1) * per]


def global_batch_from_host_batches(mesh: Mesh, host_batch: dict) -> dict:
    """Form a globally-sharded batch from per-host local batches
    (multi-host version of shard_batch; uses host_local_array_to_global).

    Single-process meshes take the plain ``shard_batch`` path (the two are
    equivalent there); multi-process meshes go through
    ``host_local_array_to_global_array`` and any failure RAISES — silently
    degrading to host-local data would assemble a wrong global batch.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, host_batch)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, P("data")
        ),
        host_batch,
    )
