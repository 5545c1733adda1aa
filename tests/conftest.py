"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment so sharding tests work
without TPU hardware. Must run before jax initializes a backend.

Note: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
env var, so the platform must be forced through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent XLA compilation cache: repeated suite runs (and the 2-process
# multihost workers, which inherit these env vars) skip recompiling
# identical executables. Worth minutes per run on this single-core CPU.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/mask_rcnn_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
