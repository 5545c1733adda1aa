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

# The persistent XLA compile cache is deliberately disabled for the CPU
# test suite (and, via inherited env, its subprocess workers). XLA:CPU AOT
# cache entries record compile-machine features (incl. pseudo-features like
# +prefer-no-scatter) that fail the load-time check on this host ("could
# lead to execution errors such as SIGILL"), and a run with the cache
# enabled produced exactly one hard worker abort under pytest-xdist. The
# package itself also refuses the cache when the RESOLVED backend is cpu
# (mask_rcnn_tpu/__init__.py); popping it here additionally avoids the
# import-time backend initialization that gate performs.
os.environ.pop("MASK_RCNN_TPU_COMPILE_CACHE", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    # `medium` implies `slow`: the fast tier (-m "not slow") skips both,
    # `-m medium` runs exactly the medium tier, `-m "slow and not medium"`
    # the heavy tier. Full coverage = all three; only the default
    # invocation's wall-clock changes.
    for item in items:
        if "medium" in item.keywords:
            item.add_marker(pytest.mark.slow)
