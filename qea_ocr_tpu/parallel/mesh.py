"""Device-mesh construction and sharding helpers.

The reference has no distributed layer at all (SURVEY.md §5: single process,
single device; its only multi-GPU artifact is a dormant `nn.DataParallel`).
The TPU-native scaling story is idiomatic GSPMD data parallelism:

  * one `jax.sharding.Mesh` with a `data` axis over all chips;
  * model/optimizer state replicated (`P()`), batches sharded on their
    leading (document/word) axis (`P("data")`);
  * the SAME jitted step functions used single-chip — XLA partitions the
    computation and inserts the gradient `psum` over ICI automatically from
    the sharding annotations. No collective is hand-written.

Host-side responsibilities under DP: each process feeds its local shard of
the batch and runs the OCR query engine for its own strips; tracked-label
history and CER tables index by global strip id so they merge trivially.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (model/optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Shard every array in a batch pytree along its leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
