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


def default_mxu_packed() -> bool:
    """Resolve the `mxu_packed=None` (auto) UNet layout choice: packed on
    TPU-class backends (where channel-starved shallow convs waste the MXU —
    see qea_ocr_tpu/ops/s2d.py), vanilla elsewhere (CPU pays the 4x nominal
    FLOPs without the utilization win). `QEA_MXU_PACKED=0/1` overrides."""
    env = os.environ.get("QEA_MXU_PACKED")
    if env is not None:
        return env not in ("0", "false", "False")
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
