"""Tensor-parallel parameter sharding over a 2-D (data x model) mesh.

The reference is strictly single-device (SURVEY.md §1/§5), so data
parallelism is the architecturally-motivated scaling axis for these models
(a 31M-param UNet + 8M-param CRNN easily fit one chip). This module adds
the orthogonal GSPMD axis anyway: parameters physically distributed over a
`model` mesh axis, so the same jitted steps scale past the point where
replicated optimizer state would waste HBM (many-document batches, larger
`init_features`/`lstm_hidden` variants) — the ZeRO/weight-sharded regime.

Mechanics (idiomatic GSPMD — no hand-written collectives):
  * `make_mesh_2d(n_data, n_model)` builds a `Mesh` with ("data", "model").
  * `tp_spec(leaf, n_model)` maps a parameter leaf to a `PartitionSpec`
    that shards its trailing (output-feature) axis over `model` when
    divisible: Conv kernels (kh, kw, cin, cout) and Dense/LSTM kernels
    (in, out) shard `cout`/`out`; 1-D scales/biases shard when large enough;
    everything else (scalars, vocab-sized heads, tiny stats) replicates.
  * `put_tp(state, mesh)` applies the rule to a whole `ModelState` pytree —
    Adam moments share their parameter's shape and land on the same shard.

Because a `PartitionSpec` only constrains LAYOUT, not math, any leaf rule
is numerically exact: XLA partitions each matmul/conv over the model axis
and inserts the all-gathers / reduce-scatters it needs. The gradient psum
over `data` comes from the batch sharding exactly as in `mesh.py`.
`tests/test_parallel.py` asserts the 2-D-mesh two-phase step reproduces the
single-device losses bit-for-bit (up to reduction order).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """("data", "model") mesh. On real slices, lay `model` on the fastest
    ICI ring (innermost axis) — weight all-gathers ride it every step while
    the data-axis psum fires once per step."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_spec(x: Any, n_model: int, min_shard: int = 2) -> P:
    """PartitionSpec sharding the trailing feature axis over `model`.

    Replicates anything whose last axis is not divisible by `n_model` or
    would shard below `min_shard` elements per device (tiny vectors are
    cheaper replicated than gathered).
    """
    shape = getattr(x, "shape", ())
    if len(shape) == 0:
        return P()
    last = shape[-1]
    if last % n_model != 0 or last // n_model < min_shard:
        return P()
    return P(*([None] * (len(shape) - 1)), MODEL_AXIS)


def put_tp(tree: Any, mesh: Mesh, min_shard: int = 2) -> Any:
    """Distribute a state pytree: feature-sharded params/moments/stats on
    the `model` axis, everything else replicated (never sharded on `data`)."""
    n_model = mesh.shape[MODEL_AXIS]

    def place(x):
        spec = tp_spec(x, n_model, min_shard)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def put_batch_2d(tree: Any, mesh: Mesh) -> Any:
    """Shard a batch pytree on its leading axis over `data` (replicated
    over `model`)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
