"""Test harness: force an 8-virtual-device CPU platform before JAX loads so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-prepends the TPU platform to JAX_PLATFORMS;
# override after import so tests really run on the 8-virtual-device CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache (per-platform dir — mixing CPU and the
# remote-compiled TPU artifacts triggers AOT machine-feature mismatches).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
