"""Multi-host data-parallel layer (`parallel/multihost.py`).

Real multi-process JAX cannot run in this image, so these tests pin the
two things that make the design correct without it:

  * the INDEX layout: host p's iterator slice of every global batch is
    exactly the rows its addressable devices hold under `P("data")` on a
    mesh built in default device order;
  * the single-process degenerate case is bit-identical to the proven
    `put_batch` path (so the trainer's swap to `put_batch_global` is a
    no-op until there really are multiple processes).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qea_ocr_tpu.data.pipeline import batch_iterator  # noqa: E402
from qea_ocr_tpu.parallel import (  # noqa: E402
    global_from_local,
    local_batch_size,
    make_mesh,
    put_batch,
    put_batch_global,
    shard_indices_for_host,
)


class _Range:
    """Dataset of ints 0..n-1 (identity samples)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


def test_shard_indices_partition():
    """Host shards are disjoint, equal-sized, and concatenate (in process
    order, per window) back to the global step sequence."""
    rng = np.random.default_rng(0)
    indices = rng.permutation(103)
    D, pc = 8, 4
    dl = local_batch_size(D, pc)
    shards = [shard_indices_for_host(indices, D, p, pc) for p in range(pc)]
    steps = len(indices) // D
    assert all(len(s) == steps * dl for s in shards)
    rebuilt = np.concatenate(
        [np.concatenate([s[k * dl:(k + 1) * dl] for s in shards])
         for k in range(steps)])
    np.testing.assert_array_equal(rebuilt, indices[:steps * D])


def test_local_batch_size_divisibility():
    with pytest.raises(ValueError):
        local_batch_size(10, 4)


def test_batch_iterator_host_shard_matches_global():
    """Interleaving per-host iterator outputs reproduces the unsharded
    global batches — same seed, same epoch, any host count."""
    ds = _Range(50)
    D, pc = 8, 2
    collate = lambda xs: np.asarray(xs)  # noqa: E731
    global_batches = list(batch_iterator(
        ds, D, collate, seed=3, epoch=2, drop_last=True))
    host_streams = [
        list(batch_iterator(ds, D, collate, seed=3, epoch=2,
                            host_shard=(p, pc)))
        for p in range(pc)
    ]
    assert len(host_streams[0]) == len(global_batches)
    for k, gb in enumerate(global_batches):
        np.testing.assert_array_equal(
            np.concatenate([host_streams[p][k] for p in range(pc)]), gb)


def test_row_placement_contract():
    """Under `P("data")` on a mesh built in default device order, device k
    holds global rows [k*Dl, (k+1)*Dl) — the same rows
    `shard_indices_for_host` assigns to the process owning device k. This
    is the layout assumption `global_from_local` relies on."""
    mesh = make_mesh()
    n_dev = len(mesh.devices.flat)
    D = n_dev * 2
    x = np.arange(D * 3, dtype=np.float32).reshape(D, 3)
    g = put_batch(jnp.asarray(x), mesh)
    for shard in g.addressable_shards:
        k = list(mesh.devices.flat).index(shard.device)
        rows = x[k * 2:(k + 1) * 2]
        np.testing.assert_array_equal(np.asarray(shard.data), rows)


def test_put_batch_global_single_process_equivalence():
    mesh = make_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    a = put_batch(jnp.asarray(x), mesh)
    b = put_batch_global(x, mesh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = global_from_local(x, mesh)
    assert c.sharding.spec == a.sharding.spec
    np.testing.assert_array_equal(np.asarray(c), x)


def test_global_from_local_feeds_jit():
    """A globally-assembled batch drives a sharded jitted reduction."""
    mesh = make_mesh()
    x = np.ones((8, 5), np.float32)
    g = global_from_local(x, mesh)
    out = jax.jit(lambda a: a.sum())(g)
    assert float(out) == 40.0
