"""bfloat16 mixed-precision training validation: bf16 compute must produce
finite losses that track the f32 run closely over several optimizer steps
(master params stay f32; only the graph compute is cast —
models/mask_rcnn.py cast_params)."""

import dataclasses

import jax
import numpy as np
import pytest

from mask_rcnn_tpu.engine import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from mask_rcnn_tpu.models import init_params
from mask_rcnn_tpu.models.targets import (
    AnchorTargetConfig,
    ProposalTargetConfig,
)
from tests.test_parallel import make_tiny_batch, tiny_cfg


def _run_steps(cfg, n_steps=4):
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer, _ = make_optimizer(params, base_lr=0.01, total_steps=100)
    state = create_train_state(params, optimizer)
    step = jax.jit(
        make_train_step(
            cfg,
            optimizer,
            proposal_cfg=ProposalTargetConfig(n_sample=8),
            anchor_cfg=AnchorTargetConfig(n_sample=16),
        )
    )
    batch = make_tiny_batch(2)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
        losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))
    return losses, jax.device_get(state.params)


@pytest.mark.slow
def test_bf16_training_tracks_f32():
    cfg32 = tiny_cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")

    l32, p32 = _run_steps(cfg32)
    l16, p16 = _run_steps(cfg16)

    assert all(np.isfinite(l16)), l16
    # bf16 has ~3 decimal digits; losses should track within a few percent
    # at this scale, and must move in the same direction.
    for a, b in zip(l32, l16):
        assert abs(a - b) / max(abs(a), 1e-6) < 0.08, (l32, l16)

    # master params stay f32 in both runs
    leaf32 = p32["rpn"]["conv1"]["W"]
    leaf16 = p16["rpn"]["conv1"]["W"]
    assert np.asarray(leaf32).dtype == np.float32
    assert np.asarray(leaf16).dtype == np.float32
    # and both runs actually updated them
    assert np.abs(np.asarray(leaf16) - np.asarray(leaf32)).max() > 0
