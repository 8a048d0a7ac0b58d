"""Device mesh + sharding helpers.

The reference has no distributed support at all (SURVEY.md §2.9: no DDP /
NCCL / MPI anywhere; its only parallelism is DataLoader workers).  The
TPU-native equivalent at this model scale (~20M params) is pure data
parallelism over ICI: scenes shard across the 'data' mesh axis, parameters
replicate, and jit inserts psums for the gradient reduction.

The model's batch is a SceneBatch pytree whose every leaf has the scene
axis leading, so one PartitionSpec covers it.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a SceneBatch (or any pytree with leading scene axis) onto the
    mesh, sharded over its first axis.

    The scene count must divide evenly by the mesh size: silently uneven
    shards would skew every global-batch reduction (loss means, DYNAMIC
    class weights).  Callers with ragged final batches should pad to a
    multiple of the mesh size with masked scenes (all-False obj_mask/
    edge_mask rows contribute nothing to any loss or metric) or drop the
    remainder, as the reference's DataLoader(drop_last=True) does.
    """
    n_dev = mesh.shape[axis]
    leaves = jax.tree.leaves(batch)
    if leaves and leaves[0].shape[0] % n_dev != 0:
        raise ValueError(
            f"batch of {leaves[0].shape[0]} scenes does not divide over "
            f"{n_dev} devices on mesh axis {axis!r}; pad with masked scenes "
            "or drop the remainder"
        )
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batch(batches: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a K-stacked SceneBatch (leading microstep axis, scenes second —
    the input of ``make_multi_train_step``) on the mesh: scenes shard over
    the mesh axis, the K microstep axis replicates."""
    n_dev = mesh.shape[axis]
    leaves = jax.tree.leaves(batches)
    if leaves and leaves[0].shape[1] % n_dev != 0:
        raise ValueError(
            f"stacked batch of {leaves[0].shape[1]} scenes does not divide "
            f"over {n_dev} devices on mesh axis {axis!r}"
        )
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batches)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_eval_batches(loader, mesh: Mesh, axis: str = "data"):
    """Wrap an eval loader for data-parallel evaluation (SURVEY §5:
    per-device scene shards + host-side metric merge): ragged batches are
    padded with fully-masked scenes (which the metric engine skips) to a
    multiple of the mesh size, then sharded over the scene axis."""
    from vlsat_tpu.scene import pad_batch_scenes

    n_dev = mesh.shape[axis]
    for batch in loader:
        b = batch.num_scenes
        total = -(-b // n_dev) * n_dev
        yield shard_batch(pad_batch_scenes(batch, total), mesh, axis=axis)
