import jax
import numpy as np
import pytest

from mask_rcnn_tpu.engine import (
    create_train_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
)
from mask_rcnn_tpu.models import MaskRCNNConfig, ProposalConfig, init_params
from mask_rcnn_tpu.models.targets import (
    AnchorTargetConfig,
    ProposalTargetConfig,
)
from mask_rcnn_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicated,
    shard_batch,
)


def tiny_cfg():
    return MaskRCNNConfig(
        n_fg_class=2,
        min_size=64,
        max_size=64,
        anchor_scales=(1.0, 2.0),
        proposal=ProposalConfig(
            n_train_pre_nms=64, n_train_post_nms=16,
            n_test_pre_nms=64, n_test_post_nms=16,
        ),
    )


def make_tiny_batch(n):
    rng = np.random.RandomState(0)
    return {
        "image": rng.randn(n, 64, 64, 3).astype(np.float32),
        "bbox": np.tile(
            np.asarray([[[8.0, 8.0, 40.0, 44.0]]], np.float32), (n, 1, 1)
        ),
        "label": np.zeros((n, 1), np.int32),
        "bbox_valid": np.ones((n, 1), bool),
        "mask": np.ones((n, 1, 64, 64), np.uint8),
        "scale": np.ones((n,), np.float32),
    }


def test_trainable_mask_rules():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params)
    assert mask["extractor"]["conv1"]["W"] is False
    assert mask["extractor"]["res2"]["a"]["conv1"]["W"] is False
    assert mask["extractor"]["res3"]["a"]["conv1"]["W"] is True
    assert mask["extractor"]["res3"]["a"]["bn1"]["scale"] is False
    assert mask["head"]["res5"]["a"]["bn2"]["bias"] is False
    assert mask["head"]["cls_loc"]["W"] is True
    assert mask["rpn"]["conv1"]["b"] is True


@pytest.mark.medium
def test_parallel_train_step_8_devices():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    mesh = make_mesh(jax.devices()[:8])
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer, _ = make_optimizer(params, base_lr=0.01, total_steps=10)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(
        cfg,
        optimizer,
        proposal_cfg=ProposalTargetConfig(n_sample=8),
        anchor_cfg=AnchorTargetConfig(n_sample=16),
    )
    p_step = make_parallel_train_step(step_fn, mesh)

    batch = shard_batch(make_tiny_batch(8), mesh)
    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    rng = jax.device_put(jax.random.PRNGKey(1), rep)

    old_rpn = np.asarray(params["rpn"]["conv1"]["W"])
    old_conv1 = np.asarray(params["extractor"]["conv1"]["W"])
    new_state, metrics = p_step(state, batch, rng)

    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    new_params = jax.device_get(new_state.params)
    # trainable params moved; frozen params identical
    assert np.abs(new_params["rpn"]["conv1"]["W"] - old_rpn).max() > 0
    np.testing.assert_array_equal(
        new_params["extractor"]["conv1"]["W"], old_conv1
    )
    # result is replicated across all devices
    assert len(new_state.params["rpn"]["conv1"]["W"].devices()) == 8


@pytest.mark.medium
def test_one_device_vs_eight_device_equality():
    """The same global batch on a 1-device and an 8-device mesh must produce
    the same loss/metrics and the same parameter update (reference DP
    semantics, SURVEY.md §2.6): sharding the batch axis only changes the
    gradient reduction order, nothing else."""
    cfg = tiny_cfg()
    # host copies: the jitted step donates its input state, which would
    # otherwise invalidate buffers shared between the two mesh runs
    params = jax.device_get(init_params(jax.random.PRNGKey(0), cfg))
    optimizer, _ = make_optimizer(params, base_lr=0.01, total_steps=10)
    step_fn = make_train_step(
        cfg,
        optimizer,
        proposal_cfg=ProposalTargetConfig(n_sample=8),
        anchor_cfg=AnchorTargetConfig(n_sample=16),
    )
    batch = make_tiny_batch(8)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        p_step = make_parallel_train_step(step_fn, mesh)
        state = jax.device_put(
            create_train_state(params, optimizer), replicated(mesh)
        )
        rng = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
        metrics_seq = []
        for _ in range(2):
            state, metrics = p_step(state, shard_batch(batch, mesh), rng)
            metrics_seq.append(
                {k: float(v) for k, v in jax.device_get(metrics).items()}
            )
        results[n_dev] = (metrics_seq, jax.device_get(state.params))

    m1, p1 = results[1]
    m8, p8 = results[8]
    for step_m1, step_m8 in zip(m1, m8):
        assert step_m1.keys() == step_m8.keys()
        for k in step_m1:
            # f32 reduction-order reassociation across shards gives
            # O(sqrt(n)*eps) ~ 1e-5 relative on the element sums
            np.testing.assert_allclose(
                step_m1[k], step_m8[k], rtol=5e-5, atol=1e-6,
                err_msg=f"metric {k} differs between 1- and 8-device meshes",
            )
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        )


def test_lr_schedule_steps():
    from mask_rcnn_tpu.engine import step_lr_schedule

    sched = step_lr_schedule(0.02, total_steps=180)
    np.testing.assert_allclose(float(sched(0)), 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(sched(121)), 0.002, rtol=1e-6)
    np.testing.assert_allclose(float(sched(161)), 0.0002, rtol=1e-6)


@pytest.mark.medium
def test_parallel_predict_matches_single_device():
    """8-way sharded inference must equal the single-device graph on the
    same batch (no cross-shard dependence by construction)."""
    from mask_rcnn_tpu.models import predict_step
    from mask_rcnn_tpu.parallel import (
        batch_sharding,
        make_parallel_predict_step,
    )

    assert len(jax.devices()) >= 8
    mesh = make_mesh(jax.devices()[:8])
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(3)
    images = rng.randn(8, 64, 64, 3).astype(np.float32) * 10
    sizes = np.tile(np.asarray([[64.0, 64.0]], np.float32), (8, 1))
    scales = np.ones((8,), np.float32)

    pred = lambda p, i, s, sc: predict_step(p, cfg, i, s, sc)  # noqa: E731

    ref = jax.jit(pred)(params, images, sizes, scales)

    p_pred = make_parallel_predict_step(pred, mesh)
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    got = p_pred(
        jax.device_put(params, rep),
        jax.device_put(images, sh),
        jax.device_put(sizes, sh),
        jax.device_put(scales, sh),
    )
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )
    # outputs are batch-sharded across the 8 devices
    assert len(got["scores"].sharding.device_set) == 8


def test_local_batch_slice_rejects_remainder():
    """A global batch that does not divide over the process count would
    silently leave the remainder examples unassigned to any host."""
    import pytest

    from mask_rcnn_tpu.parallel import local_batch_slice

    assert local_batch_slice(8, 1, 2) == slice(4, 8)
    with pytest.raises(ValueError, match="never be assigned"):
        local_batch_slice(7, 0, 2)
