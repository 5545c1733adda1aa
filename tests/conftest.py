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
# multihost workers, which set the same config) skip recompiling identical
# executables. Worth minutes per run on this single-core CPU. This jax
# version ignores the JAX_COMPILATION_CACHE_DIR env var, so it must go
# through jax.config.update after import; the env var below additionally
# reaches CLI subprocesses (mask_rcnn_tpu/__init__.py honors it).
os.environ.setdefault(
    "MASK_RCNN_TPU_COMPILE_CACHE", "/tmp/mask_rcnn_tpu_jax_cache"
)
_cache_dir = os.environ["MASK_RCNN_TPU_COMPILE_CACHE"]
# Under pytest-xdist, give each worker its own cache dir (stable across
# runs via the gwN id): four processes hammering one directory produced a
# rare hard abort in a worker; per-worker dirs keep run-to-run reuse
# without cross-process races.
if os.environ.get("PYTEST_XDIST_WORKER"):
    _cache_dir = f"{_cache_dir}_{os.environ['PYTEST_XDIST_WORKER']}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
