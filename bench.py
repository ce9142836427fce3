"""Benchmark harness (driver contract: ONE JSON line on stdout).

Metric: patch-training documents/sec/chip for the full two-phase step
(phase A proxy update + phase B prep update) at production shapes —
(400, 512) documents, 16 strip slots, UNet-32 + CRNN-256 — excluding the
black-box OCR on both sides (it is host-bound and engine-dependent).

Baseline denominator: the PyTorch reference-shaped step (batch = 1 document,
per-strip crop loop, `benchmarks/torch_baseline.py`) on this host, because
the reference publishes no throughput numbers (BASELINE.md).

All diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _env_flag(name: str, default: bool) -> bool:
    """Parse a 0/1 env knob; empty/unset falls back to the default instead
    of crashing the one-JSON-line driver contract on `QEA_BENCH_FUSED=`."""
    raw = os.environ.get(name, "").strip()
    if not raw:
        return default
    return raw.lower() not in ("0", "false", "no", "off")


def _probe_device(tries: int = 6, probe_secs: int = 120,
                  backoff_secs: int = 120) -> None:
    """Chip-lease health gate (python port of scripts/tpu_health.sh).

    On the tunneled axon platform a lingering lease from a previously
    killed — or even cleanly exited — TPU process WEDGES the next client
    inside its first device op (~0% CPU, SIGTERM-immune). That is the
    round-4 cold-start blow-up: BENCH_r04's 1236.9 s "compile+first step"
    vs ≤290 s in rounds 1-3 was lease-wait, not compile (steady-state
    throughput was unchanged). Probing from a SIGKILL-able subprocess
    keeps the wedge out of the measuring process and bounds the wait."""
    import subprocess

    if os.environ.get("QEA_PLATFORM") == "cpu":
        return
    code = ("import jax, jax.numpy as jnp; "
            "print('TPU-OK', float(jnp.sum(jnp.ones((256,256)) @ "
            "jnp.ones((256,256)))))")
    for i in range(1, tries + 1):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  timeout=probe_secs)
            if proc.returncode == 0 and "TPU-OK" in proc.stdout:
                log(f"device probe {i}/{tries} OK in "
                    f"{time.perf_counter() - t0:.1f}s")
                return
            log(f"device probe {i}/{tries} rc={proc.returncode}; stderr "
                f"tail: {proc.stderr.strip().splitlines()[-1:] or ''}")
        except subprocess.TimeoutExpired:
            # subprocess.run kills (SIGKILL) the child on timeout expiry
            log(f"device probe {i}/{tries} wedged after {probe_secs}s "
                "(lease still held); killed")
        if i < tries:
            log(f"backing off {backoff_secs}s before next probe")
            time.sleep(backoff_secs)
    raise RuntimeError(
        f"device unreachable after {tries} probes — chip lease not "
        "released (see CLAUDE.md 'Environment gotchas')")


def run_tpu(n_steps: int = 20, D: int = 96, S: int = 16) -> float:
    """96-doc batches: measured sweet spot on a single v5e — per-doc step
    time improves ~2.3x over 32-doc batches (fixed overheads + small-grid
    tiling amortize). Larger batches OOM at compile (15.75G HBM): the fused
    step needs 22.05G at D=112; per-block `UNet.remat` makes it WORSE
    (18.43G at D=96 vs fitting without) because the checkpoint barriers
    defeat XLA's elementwise-into-conv fusion that keeps the liveset lean.
    See benchmarks/RESULTS.md 'Batch-size and remat levers'."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.train.patch_steps import make_steps
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.models import CRNN, UNet
    from qea_ocr_tpu.tracking import decaying_weights
    from qea_ocr_tpu.utils.charmap import CharMap

    doc_size = C.DOC_SIZE
    cm = CharMap.default()
    L = cm.max_len
    W = 1
    N = D * S
    log(f"[{time.strftime('%H:%M:%S')}] initializing models "
        "(first in-process device op follows — a hang here is a wedged "
        "chip lease, not a slow compile)")
    from qea_ocr_tpu.utils.platform import default_mxu_packed
    # grad model pins conv_impl="xla" (cmajor bwd at D=96 OOMs: 27.6G vs
    # 15.75G HBM, measured); the eval twin resolves `auto` (= xla unless
    # QEA_CONV_IMPL=cmajor is set) — mirrors the production trainer.
    # QEA_BENCH_REMAT: ""/0 off, 1/true full per-block remat (measured
    # worse, RESULTS.md), "shallow" = enc1/dec1 only (the selective probe
    # for unlocking D>96)
    remat_raw = os.environ.get("QEA_BENCH_REMAT", "").strip().lower()
    remat = ("shallow" if remat_raw == "shallow"
             else _env_flag("QEA_BENCH_REMAT", False))
    prep = UNet(remat=remat,
                mxu_packed=default_mxu_packed(), conv_impl="xla")
    prep_eval = UNet(remat=remat,
                     mxu_packed=default_mxu_packed())
    crnn = CRNN(vocab_size=cm.vocab_size)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    prep_state = ModelState.create(
        prep.init(k1, jnp.zeros((1, 1, *doc_size)), train=False),
        adam_l2(5e-5, 5e-4))
    crnn_state = ModelState.create(
        crnn.init(k2, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False),
        adam_l2(1e-4, 5e-4))
    steps = make_steps(prep, crnn, cm, prep_eval_model=prep_eval)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((D, 1, *doc_size), dtype=np.float32))
    bboxes = np.zeros((D, S, 4), np.int32)
    bboxes[..., 0] = rng.integers(0, 380, (D, S))
    bboxes[..., 1] = rng.integers(0, 360, (D, S))
    bboxes[..., 2] = bboxes[..., 0] + rng.integers(16, 127, (D, S))
    bboxes[..., 3] = bboxes[..., 1] + rng.integers(10, 31, (D, S))
    bboxes = jnp.asarray(bboxes)
    strip_mask = jnp.ones((D, S), bool)
    gt_labels = jnp.asarray(
        np.where(np.arange(L)[None, None] < 8,
                 rng.integers(1, cm.vocab_size, (D, S, L)), cm.pad_id)
        .astype(np.int32))
    gt_lengths = jnp.full((D, S), 8, jnp.int32)
    strip_ids = jnp.arange(N, dtype=jnp.int32).reshape(D, S)
    cer_table = jnp.ones((N,), jnp.float32)
    ent_table = jnp.ones((N,), jnp.float32)
    hist_labels = jnp.broadcast_to(
        gt_labels.reshape(N, 1, L), (N, W, L))
    hist_lengths = jnp.full((N, W), 8, jnp.int32)
    hist_valid = jnp.ones((N, W), bool)
    lw = decaying_weights(0.7, W)
    bb_mask = jnp.ones((N,), bool)

    fused = _env_flag("QEA_BENCH_FUSED", True)
    # QEA_BENCH_MICRO_STEPS=G measures the equal-query quality recipe's
    # operating point: G sequential (phase A -> phase B) chunk updates per
    # dispatch (lax.scan inside the fused program; patch_steps micro-
    # stepping note) — bs=D/G optimizer dynamics at D-batch amortization.
    micro = int(os.environ.get("QEA_BENCH_MICRO_STEPS", "1") or "1")

    def one_step(prep_state, crnn_state, cer_table, ent_table):
        # two dispatches per batch, mirroring the trainer: prep_extract
        # (host OCR happens between these in production), then the FUSED
        # phase A+B program (no inter-phase host sync).
        # QEA_BENCH_FUSED=0 probes the split-phase path (two smaller XLA
        # programs — lower peak HBM, one extra dispatch per batch).
        _, strips = steps.prep_extract(prep_state, images, bboxes)
        if fused:
            prep_state, crnn_state, doc_out, metrics, cer_table, ent_table, _ = \
                steps.phase_ab(prep_state, crnn_state, images, bboxes,
                               strip_mask, gt_labels, cer_table, ent_table,
                               gt_lengths, strip_ids, strips, bb_mask,
                               hist_labels, hist_lengths, hist_valid, lw,
                               strips[None], hist_labels[:, 0][None],
                               hist_lengths[:, 0][None],
                               decaying=True, inner_limit_skip=True,
                               update_crnn=False, micro_steps=micro,
                               micro_refresh=_env_flag(
                                   "QEA_BENCH_MICRO_REFRESH", micro > 1))
        else:
            crnn_state, _ = steps.phase_a(
                crnn_state, strips, bb_mask, hist_labels, hist_lengths,
                hist_valid, lw, strips[None], hist_labels[:, 0][None],
                hist_lengths[:, 0][None], decaying=True,
                inner_limit_skip=True)
            prep_state, crnn_state, doc_out, metrics, cer_table, ent_table = \
                steps.phase_b(prep_state, crnn_state, images, bboxes,
                              strip_mask, gt_labels, cer_table, ent_table,
                              gt_lengths, strip_ids, update_crnn=False,
                              micro_steps=micro)
        return prep_state, crnn_state, cer_table, ent_table, metrics["loss"]

    # warmup / compile. Sync via a host fetch of the loss value:
    # `block_until_ready` alone does not flush execution on the remote
    # tunnel platform, which inflates throughput ~8x past bf16
    # speed-of-light (verified against XLA cost analysis: ~15 TFLOP/step).
    t0 = time.perf_counter()
    prep_state, crnn_state, cer_table, ent_table, loss = one_step(
        prep_state, crnn_state, cer_table, ent_table)
    float(jax.device_get(loss))
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s "
        f"(device={jax.devices()[0].device_kind})")

    t0 = time.perf_counter()
    for _ in range(n_steps):
        prep_state, crnn_state, cer_table, ent_table, loss = one_step(
            prep_state, crnn_state, cer_table, ent_table)
    float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    dps = n_steps * D / dt
    log(f"TPU: {n_steps} steps x {D} docs in {dt:.2f}s -> {dps:.2f} docs/s")
    _log_mfu(dps, D, jax.devices()[0].device_kind)
    return dps


def _log_mfu(dps: float, D: int, device_kind: str) -> None:
    """Stderr MFU estimate. The 49.5 TFLOP/step figure at D=96 is XLA's
    cost analysis of the two jitted phases (benchmarks/RESULTS.md roofline,
    `benchmarks/profile_step.py`); FLOPs scale linearly in D."""
    peaks = {"v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
             "v4": 275.0, "v6": 918.0, "v6e": 918.0}
    kind = device_kind.lower()
    peak = next((v for k, v in peaks.items() if k in kind), None)
    if peak is None:
        log(f"MFU: unknown peak for device kind {device_kind!r}")
        return
    tflop_step = 49.5 * D / 96.0
    achieved = dps / D * tflop_step  # steps/s * TFLOP/step
    log(f"MFU: {achieved:.1f} TF/s / {peak:.0f} peak bf16 = "
        f"{100 * achieved / peak:.1f}% ({device_kind})")


def run_torch_baseline() -> float:
    """Pinned denominator: a live torch run on this contended 1-core host
    is noisy (the round-1/round-2 denominators differed 1.6x with no code
    change), so the baseline is measured ONCE — median of 3 independent
    8-doc runs — and cached per host in `benchmarks/baseline_cache.json`.
    Delete the file (or set QEA_BENCH_REBASELINE=1) to re-measure."""
    import platform
    import statistics

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    cache_path = os.path.join(repo, "benchmarks", "baseline_cache.json")
    key = (f"{platform.node()}|cpu{os.cpu_count()}|"
           f"{os.environ.get('BENCH_BASELINE_DEVICE', 'cpu')}")
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    if key in cache and not _env_flag("QEA_BENCH_REBASELINE", False):
        dps = cache[key]["docs_per_sec"]
        log(f"torch baseline (cached, {key}): {dps:.3f} docs/s "
            f"[median of {cache[key]['n_runs']} x "
            f"{cache[key]['n_docs']}-doc runs]")
        return dps

    from benchmarks.torch_baseline import run_baseline
    n_docs, n_runs = 8, 3
    runs = [run_baseline(n_docs=n_docs, strips_per_doc=16, warmup=1)
            for _ in range(n_runs)]
    dps = statistics.median(runs)
    cache[key] = {"docs_per_sec": round(dps, 4), "n_docs": n_docs,
                  "n_runs": n_runs,
                  "runs": [round(r, 4) for r in runs]}
    with open(cache_path, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    log(f"torch baseline (measured {n_runs} x {n_docs} docs: "
        f"{[f'{r:.3f}' for r in runs]}): median {dps:.3f} docs/s "
        f"-> cached {cache_path}")
    return dps


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # Chip-lease gate BEFORE the first in-process device op, then the
    # per-platform persistent compile cache (`.jax_cache/default` on the
    # pinned TPU platform) so only the first bench after a step-code
    # change pays the ~3-min full-step compile.
    _probe_device()
    from qea_ocr_tpu.utils.platform import setup_platform
    setup_platform()
    tpu_dps = run_tpu(
        n_steps=int(os.environ.get("QEA_BENCH_STEPS", 20)),
        D=int(os.environ.get("QEA_BENCH_DOCS", 96)))
    try:
        base_dps = run_torch_baseline()
    except Exception as e:  # torch missing or baseline failure
        log(f"baseline failed: {e!r}")
        base_dps = None
    vs = (tpu_dps / base_dps) if base_dps else None
    print(json.dumps({
        "metric": "patch_train_docs_per_sec_per_chip",
        "value": round(tpu_dps, 3),
        "unit": "docs/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
