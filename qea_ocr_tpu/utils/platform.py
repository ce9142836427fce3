"""Platform selection + compilation-cache setup for CLI entry points.

The deployment image's sitecustomize pins JAX_PLATFORMS to the TPU plugin;
`QEA_PLATFORM=cpu` (optionally with
`XLA_FLAGS=--xla_force_host_platform_device_count=N`) overrides it for
hermetic CPU runs. A per-platform persistent compilation cache avoids
recompiles across invocations.
"""

from __future__ import annotations

import os


def setup_platform(cache_root: str | None = None) -> None:
    import jax

    plat = os.environ.get("QEA_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # Numerical sanitizer: raise on NaNs inside jitted computations (the
    # functional counterpart of the reference's NaN-gradient backward hook,
    # `models/model_crnn.py:30-32`, for debugging CTC instabilities).
    if os.environ.get("QEA_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    cache_root = cache_root or os.environ.get(
        "QEA_COMPILE_CACHE", os.path.join(os.getcwd(), ".jax_cache"))
    name = plat or "default"
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_root, name))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    maybe_init_distributed()


def maybe_init_distributed() -> None:
    """Opt-in multi-process (TPU pod) runtime for CLI entry points.

    `QEA_DISTRIBUTED=1` calls `jax.distributed.initialize()` before any
    backend use. On Cloud TPU pod slices the coordinator/process topology
    auto-detects from the TPU metadata; elsewhere (or to force a manual
    cluster, e.g. CPU simulation) set all three of `QEA_COORDINATOR`
    (host:port), `QEA_NUM_PROCESSES`, and `QEA_PROCESS_ID`. The trainers
    pick the topology up via `jax.process_count()` (multi-host layer,
    `parallel/multihost.py`); launchers: `scripts/run_patch_training.sh`.
    """
    if os.environ.get("QEA_DISTRIBUTED", "").strip() not in ("1", "true"):
        return
    import jax
    from jax._src import distributed as _distributed
    if getattr(_distributed.global_state, "client", None) is not None:
        return  # already initialized (e.g. by a test harness)
    kwargs = {}
    if os.environ.get("QEA_COORDINATOR"):
        kwargs = dict(
            coordinator_address=os.environ["QEA_COORDINATOR"],
            num_processes=int(os.environ["QEA_NUM_PROCESSES"]),
            process_id=int(os.environ["QEA_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)


def default_mxu_packed(batch_hint: int | None = None) -> bool:
    """Resolve the UNet conv layout (see qea_ocr_tpu/ops/s2d.py).

    Measured on a v5e at (400, 512): the packed layout wins at mid batches
    (D=32 forward: 42.8 ms vs 54.5 ms, 1.27x; end-to-end serving at batch
    32: 16.4 vs 13.0 docs/s, +26%) where plain 32/64-channel convs
    underfill the MXU, but loses at D=1 (kernel overhead) and at the D=96
    training sweet spot (116 vs 82 ms — XLA's tiling of the vanilla convs
    reaches ~45% MFU there and the packed path's 4x nominal FLOPs
    dominate). Training therefore defaults OFF (no batch_hint). Serving
    passes its fixed per-device batch as `batch_hint`, which turns packing
    on inside the measured mid-batch win window on TPU. `QEA_MXU_PACKED`
    forces either way."""
    env = os.environ.get("QEA_MXU_PACKED")
    if env is not None:
        return env.strip().lower() not in ("", "0", "false", "no", "off")
    if batch_hint is None:
        return False
    import jax
    return _mxu_packed_for_batch(int(batch_hint),
                                 jax.default_backend() == "tpu")


def _mxu_packed_for_batch(batch: int, is_tpu: bool) -> bool:
    """Pure decision core (unit-testable without a backend): pack for
    mid-size per-device batches on TPU only. Window from the serve_bench
    measurements above — win at 32, wash at 8, loss at 96."""
    return is_tpu and 16 <= batch <= 48
