"""Subprocess worker for tests/test_multihost_procs.py.

Runs one process of a 2-process CPU cluster (4 virtual devices each):
host-sharded input pipeline -> global-array assembly -> a jitted
data-parallel train step (replicated params, batch-sharded inputs — the
same GSPMD pattern the patch trainer uses). Prints the final loss and
parameter checksum; the test asserts both processes agree with each other
and with a single-process run of the same computation.

Usage: python _mh_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n_proc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qea_ocr_tpu.data.pipeline import batch_iterator  # noqa: E402
from qea_ocr_tpu.parallel import (  # noqa: E402
    make_mesh, put_batch_global, put_replicated)
from tests.test_multihost_procs import (  # noqa: E402
    DATASET_N, FEATURES, GLOBAL_BATCH, STEPS, make_sample, reference_run)


class _DS:
    def __len__(self):
        return DATASET_N

    def __getitem__(self, i):
        return make_sample(i)


def main():
    assert jax.device_count() == 4 * n_proc
    assert jax.local_device_count() == 4
    mesh = make_mesh()
    w = put_replicated(jnp.zeros((FEATURES,), jnp.float32), mesh)

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            pred = x @ w
            return jnp.mean((pred - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    collate = lambda s: (np.stack([a for a, _ in s]),  # noqa: E731
                         np.asarray([b for _, b in s], np.float32))
    loss = None
    for epoch in range(STEPS):
        for x_local, y_local in batch_iterator(
                _DS(), GLOBAL_BATCH, collate, seed=5, epoch=epoch,
                host_shard=(pid, n_proc)):
            x = put_batch_global(x_local, mesh)
            y = put_batch_global(y_local, mesh)
            w, loss = step(w, x, y)
    print(f"RESULT {float(loss):.10f} {float(jnp.sum(w)):.10f}", flush=True)
    # cross-check against the single-process closed form
    ref_loss, ref_wsum = reference_run()
    assert abs(float(loss) - ref_loss) < 1e-5, (float(loss), ref_loss)
    assert abs(float(jnp.sum(w)) - ref_wsum) < 1e-4, (float(jnp.sum(w)), ref_wsum)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
