"""Serving-path benchmark: DocumentCleaner throughput + latency.

Measures the production inference surface (`serve/cleaner.py` — the
deployment story the reference lacks, its closest analogue being
`eval_prep.py`'s sample-image dump) on the real chip:

  * steady-state throughput (docs/s) of `clean_arrays` at serving batch
    sizes, including host pad/crop and the uint8 device->host fetch;
  * single-batch latency (ms) — the interactive serving metric;
  * vanilla vs space-to-depth MXU-packed UNet layout (`ops/s2d.py`), the
    lever that wins specifically at small serving batches.

Usage:  python benchmarks/serve_bench.py          (TPU)
        QEA_PLATFORM=cpu python benchmarks/serve_bench.py  (smoke)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qea_ocr_tpu.utils.platform import setup_platform  # noqa: E402

setup_platform()

N_DOCS = int(os.environ.get("SERVE_BENCH_DOCS", 96))
BATCHES = [int(b) for b in os.environ.get("SERVE_BENCH_BATCHES", "8,32").split(",")]


def make_ckpt(tmp: str) -> str:
    """Save an untrained UNet checkpoint (throughput doesn't depend on
    weights)."""
    import jax
    import jax.numpy as jnp

    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.models import UNet
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.io import save_checkpoint

    model = UNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, *C.DOC_SIZE)), train=False)
    path = os.path.join(tmp, "prep")
    save_checkpoint(path, ModelState.create(variables, adam_l2(1e-4)))
    return path


def bench_one(ckpt: str, batch_size: int, mxu_packed: bool) -> dict:
    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.serve import DocumentCleaner

    rng = np.random.default_rng(0)
    docs = [rng.random(C.DOC_SIZE, dtype=np.float32) for _ in range(N_DOCS)]

    cleaner = DocumentCleaner(ckpt, batch_size=batch_size,
                              mxu_packed=mxu_packed)
    # warmup / compile
    cleaner.clean_arrays(docs[:batch_size])

    t0 = time.perf_counter()
    out = cleaner.clean_arrays(docs)
    dt = time.perf_counter() - t0
    assert len(out) == N_DOCS and out[0].shape == docs[0].shape

    # single-batch latency (host->device->host round trip), best of 5
    lat = min(
        (lambda t: (cleaner.clean_arrays(docs[:batch_size]),
                    time.perf_counter() - t)[1])(time.perf_counter())
        for _ in range(5))
    return dict(batch=batch_size, mxu_packed=mxu_packed,
                docs_per_s=round(N_DOCS / dt, 1),
                batch_latency_ms=round(lat * 1e3, 1))


def main():
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = make_ckpt(tmp)
        for b in BATCHES:
            for packed in (False, True):
                r = bench_one(ckpt, b, packed)
                print(f"[serve] batch={r['batch']:>3} packed={packed!s:5} "
                      f"{r['docs_per_s']:7.1f} docs/s  "
                      f"latency {r['batch_latency_ms']:.1f} ms", flush=True)
                rows.append(r)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
