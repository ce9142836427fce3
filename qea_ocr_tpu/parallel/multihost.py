"""Multi-host data parallelism: per-host input sharding + OCR fan-out.

The reference is single-process/single-device (SURVEY §1); its only
scale-out is SLURM job arrays. The TPU-native multi-HOST story (pods,
where each process addresses only its own chips) extends `parallel/mesh.py`
GSPMD data parallelism with the host-side half:

  * every process loads ONLY its slice of each global document batch
    (`shard_indices_for_host` / `batch_iterator(host_shard=...)`) — the
    shuffle is seeded identically on every host, so the global permutation
    is shared and host p takes rows [p*Dl, (p+1)*Dl) of every global batch;
  * each process runs the black-box OCR engine on ITS OWN strips only
    (the query fan-out is free: the host never materializes other hosts'
    images), and tracked-label history / CER tables are indexed by global
    strip id, replicated, and updated inside the jitted step — so the
    per-host updates merge without any explicit exchange;
  * the device boundary assembles a GLOBAL `jax.Array` from the
    process-local shard (`global_from_local` /
    `jax.make_array_from_process_local_data`): XLA sees the full (D, ...)
    batch sharded `P("data")` and partitions the same step functions it
    runs single-host. Collectives ride ICI; hosts exchange no batch data
    over DCN.

Row-placement contract (tested in tests/test_multihost.py): with the mesh
built from `jax.devices()` in default order, process p's addressable
devices hold global rows [p*Dl, (p+1)*Dl), which is exactly the slice
`shard_indices_for_host` feeds host p — concatenating per-host shards in
process order reproduces the unsharded batch.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from qea_ocr_tpu.parallel.mesh import DATA_AXIS, batch_sharding, put_batch


def process_shard(process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> Tuple[int, int]:
    """(process_index, process_count), defaulting to the JAX runtime's."""
    import jax
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return int(process_index), int(process_count)


def local_batch_size(global_batch_size: int, process_count: int) -> int:
    if global_batch_size % process_count:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{process_count} processes")
    return global_batch_size // process_count


def shard_indices_for_host(indices: np.ndarray, global_batch_size: int,
                           process_index: int, process_count: int) -> np.ndarray:
    """This host's rows of every global batch, in step order.

    `indices` is the epoch's (already shuffled, identically on every host)
    global index sequence. It is cut into windows of `global_batch_size`
    (a trailing partial window is dropped — jitted steps run in lockstep
    across hosts, so every host must see the same step count) and host p
    takes the p-th contiguous `Dl` rows of each window. Iterating the
    result with a local batch size of `Dl` yields exactly this host's
    slice of each global step batch.
    """
    dl = local_batch_size(global_batch_size, process_count)
    indices = np.asarray(indices)
    steps = len(indices) // global_batch_size
    windows = indices[:steps * global_batch_size].reshape(
        steps, global_batch_size)
    return windows[:, process_index * dl:(process_index + 1) * dl].reshape(-1)


def global_from_local(local: Any, mesh, axis: str = DATA_AXIS):
    """Assemble a global `jax.Array` sharded `P(axis)` from this process's
    local rows. Single-process this is just a sharded device_put."""
    import jax
    sharding = batch_sharding(mesh, axis)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local))


def put_batch_global(tree: Any, mesh, axis: str = DATA_AXIS) -> Any:
    """Multi-host-safe `put_batch`: under one process it is `put_batch`
    (proven path, avoids per-leaf layout churn); under many, every leaf is
    assembled from the process-local shard into a global array."""
    import jax
    if jax.process_count() == 1:
        return put_batch(tree, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: global_from_local(x, mesh, axis), tree)


def global_from_local_dim(local: Any, mesh, dim: int,
                          axis: str = DATA_AXIS):
    """`global_from_local` with the sharded (data) dimension at `dim`
    instead of 0 — e.g. jitter stacks shaped (n_jitter, N, ...) are global
    on dimension 1."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    local = np.asarray(local)
    spec = [None] * local.ndim
    spec[dim] = axis
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, local)


def local_rows(global_array) -> np.ndarray:
    """This process's contiguous rows of a `P(data)`-sharded global array,
    fetched to host. Under the row-placement contract (module docstring),
    process p gets global rows [p*Dl, (p+1)*Dl) in order. Single-process,
    this is the whole array."""
    shards = sorted(global_array.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def pinned_subset(indices: np.ndarray, process_index: int,
                  process_count: int) -> np.ndarray:
    """Static per-host partition of a dataset index list (round-robin),
    trimmed so every host owns the same count (jitted steps run in
    lockstep). Pinning documents to hosts keeps host-side state — label
    history, selection bookkeeping, OCR fan-out — consistent across epochs
    without any cross-host exchange: a host only ever queries/tracks its
    own documents."""
    indices = np.asarray(indices)
    n = len(indices) // process_count
    return indices[process_index::process_count][:n]


def process_sum(values):
    """Element-wise sum of a small host array across processes (e.g. the
    per-epoch black-box call ledger). Identity under one process."""
    import jax
    arr = np.asarray(values, np.float32)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(arr)
    return np.sum(np.asarray(gathered), axis=0)
