"""Subprocess worker for tests/test_multihost_procs.py::test_two_process_trainer.

Runs one process of a 2-process CPU cluster (4 virtual devices each)
through the REAL `TrainNNPrep(data_parallel=True)` trainer on the synthetic
world + FakeOCR: pinned per-host document subsets, per-host OCR fan-out,
global-array assembly, global masked validation (including an
empty-local-slice window on process 1), and the cross-process black-box
ledger sum.

Usage: python _mh_trainer_worker.py <process_id> <num_processes> <port> <out_dir>
"""

import faulthandler
import json
import os
import sys

faulthandler.dump_traceback_later(1500, exit=True)

pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
out_dir = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
# 4 virtual devices per process; KEEP any inherited hardening flags (the
# dryrun spawner's collective-timeout raises) but override an inherited
# device count (pytest's conftest exports 8).
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=4")
for _f in ("--xla_cpu_collective_call_warn_stuck_timeout_seconds=120",
           "--xla_cpu_collective_call_terminate_timeout_seconds=2400",
           "--xla_cpu_collective_timeout_seconds=2400"):
    if _f.split("=")[0] not in " ".join(_flags):
        _flags.append(_f)
os.environ["XLA_FLAGS"] = " ".join(_flags)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the parent (dryrun `_pass_trainer_2proc` /
# `test_two_process_trainer_epoch`) passes QEA_DRYRUN_CACHE_DIR pointing at
# the ATOMIC pair cache (`qea_ocr_tpu/utils/pair_cache.py`) — guaranteed
# symmetric (both workers warm or both cold), never the suite-shared
# `.jax_cache/cpu` dir whose partial key overlap is the one-warm-one-cold
# Gloo rendezvous hazard. The fallback is the same pair-cache default.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("QEA_DRYRUN_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", "2proc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n_proc, process_id=pid)

import numpy as np  # noqa: E402

# Establish EVERY cross-process Gloo context NOW, while the processes are
# still in lockstep: each distinct device group's context rendezvous runs
# under a fixed ~30 s key-value timeout, and the trainer's first
# collective over a not-yet-seen group otherwise lands after multi-minute
# concurrent XLA compiles whose scheduling skew on a contended
# single-core host can exceed that window. Observed BOTH ways:
# `Gloo context initialization failed: DEADLINE_EXCEEDED` on the first
# buffer fetch (process-pair group, fixed by the trivial allgather below)
# AND later on the full 8-device group (key `cpu:gloo/0,1,2,3,2048..`),
# whose context is only created by the first global-mesh collective —
# ~8 min into a symmetric-cold run. Tiny programs compile in seconds on
# both sides, so each rendezvous happens with near-zero skew; the
# trainer's heavy collectives then reuse the contexts and are governed by
# the (raised) XLA collective timeouts.
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

from qea_ocr_tpu.parallel import make_mesh, process_sum  # noqa: E402

assert int(process_sum([1])[0]) == n_proc          # process-pair group
_mesh = make_mesh()                                 # the trainer's mesh
_x = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, PartitionSpec("data")),
    np.ones((jax.local_device_count(),), np.float32))
_y = jax.jit(jnp.sum,
             out_shardings=NamedSharding(_mesh, PartitionSpec()))(_x)
assert float(np.asarray(_y)) == jax.device_count()  # full-mesh group live
print(f"[worker {pid}] gloo contexts established", flush=True)

from qea_ocr_tpu.train.patch_trainer import (  # noqa: E402
    PatchTrainerConfig, TrainNNPrep)

TRAIN_DOCS = 8
VAL_DOCS = 3        # < Dl on host 1's slice of the only window -> exercises
                    # the blank_docbatch (empty local slice) path
STRIPS = 3
PROP = 0.5
INNER = 2           # 1 tracking round + 1 jitter round


def main():
    assert jax.device_count() == 4 * n_proc
    assert jax.local_device_count() == 4
    cfg = PatchTrainerConfig(
        epochs=1, ocr="Fake", dataset="synthetic",
        synthetic_train_docs=TRAIN_DOCS, synthetic_val_docs=VAL_DOCS,
        synthetic_strips_per_doc=STRIPS, max_strips=4,
        batch_docs=TRAIN_DOCS,          # GLOBAL batch: Dl = 4 per host
        doc_size=(96, 128),
        corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
        minibatch_subset="rangeCER", minibatch_subset_prop=PROP,
        inner_limit=INNER, inner_limit_skip=True, window_size=2,
        weightgen_method="decaying", lstm_hidden=16, unet_features=4,
        data_parallel=True, exp_base_path=out_dir)
    trainer = TrainNNPrep(cfg)
    assert trainer._pc == n_proc and trainer._pi == pid
    assert trainer._dl == TRAIN_DOCS // n_proc
    best_acc, best_epoch = trainer.train()

    # per-host ledger: each host queried ONLY its pinned docs.
    # train: INNER rounds x ceil(3*(1-0.5))=2 strips x 4 local docs = 16;
    # val: host 0 OCRs the 3 val docs (9 strips), host 1's slice is empty.
    import math
    per_doc = math.ceil(STRIPS * (1 - PROP))
    local_train = INNER * per_doc * (TRAIN_DOCS // n_proc)
    local_val = VAL_DOCS * STRIPS if pid == 0 else 0
    assert trainer.ocr.total_calls == local_train + local_val, (
        pid, trainer.ocr.total_calls, local_train, local_val)

    if pid == 0:
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            rec = json.loads(f.readline())
        # GLOBAL ledger in the logged metrics (process_sum of host counters)
        assert rec["Black-Box Calls"] == INNER * per_doc * TRAIN_DOCS, rec
        assert rec["Train + Val BB Calls"] == (
            INNER * per_doc * TRAIN_DOCS + VAL_DOCS * STRIPS), rec
        assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])

    # metrics are global masked reductions -> identical on every process
    print(f"RESULT {best_acc:.10f} {best_epoch}", flush=True)
    print("TRAINER_OK", flush=True)


if __name__ == "__main__":
    main()
