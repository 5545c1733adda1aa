"""mask_rcnn_tpu — a TPU-native Mask R-CNN framework (JAX/XLA/Pallas/pjit).

Re-designed from scratch with the capability surface of
wkentaro/chainer-mask-rcnn (see SURVEY.md / DESIGN.md). The compute path is
functional JAX compiled by XLA for TPU; the reference's CUDA-in-Python kernels
are replaced by MXU-friendly formulations (RoIAlign as separable einsums) and
static-shape on-device ops (padded NMS, on-device target creation).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MASK_RCNN_TPU_COMPILE_CACHE"):
    # CPU runs are excluded: XLA:CPU AOT cache entries record
    # compile-machine features that can fail the load-time check on a
    # different (or even the same) host and abort the process — the cache
    # exists for TPU job restarts, where executables are portable. The
    # guard checks the RESOLVED backend (not the JAX_PLATFORMS env var):
    # on a CPU-only host with the env var unset, jax still resolves to
    # XLA:CPU and the cache must stay off. Setting the env var therefore
    # initializes the jax backend at import time — acceptable for an
    # opt-in knob whose only users are about to compile anyway.
    # Opt-in persistent XLA compile cache for every entry point (CLIs,
    # tests, subprocesses). Restarted jobs then skip recompiling identical
    # executables — the jax config route is required because this jax
    # version ignores the JAX_COMPILATION_CACHE_DIR env var.
    import jax as _jax

    if _jax.default_backend() != "cpu":
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["MASK_RCNN_TPU_COMPILE_CACHE"],
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from mask_rcnn_tpu import ops  # noqa: F401
from mask_rcnn_tpu import models  # noqa: F401
from mask_rcnn_tpu import utils  # noqa: F401
