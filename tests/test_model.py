import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_rcnn_tpu.models import (
    MaskRCNNConfig,
    ProposalConfig,
    init_params,
    predict_step,
    train_loss,
)
from mask_rcnn_tpu.models.api import MaskRCNNResNet
from mask_rcnn_tpu.models.targets import ProposalTargetConfig


def tiny_config(**kw):
    defaults = dict(
        n_fg_class=3,
        n_layers=50,
        min_size=64,
        max_size=96,
        # small anchors so some lie fully inside the tiny test images
        # (inside-image filtering would otherwise ignore every anchor)
        anchor_scales=(1.0, 2.0),
        proposal=ProposalConfig(
            n_train_pre_nms=120,
            n_train_post_nms=40,
            n_test_pre_nms=80,
            n_test_post_nms=24,
        ),
        detections_per_im=8,
    )
    defaults.update(kw)
    return MaskRCNNConfig(**defaults)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_init_param_shapes(tiny_model):
    cfg, params = tiny_model
    assert params["extractor"]["conv1"]["W"].shape == (7, 7, 3, 64)
    assert params["extractor"]["res4"]["a"]["conv3"]["W"].shape == (
        1, 1, 256, 1024,
    )
    assert params["rpn"]["score"]["W"].shape[-1] == cfg.n_anchor
    assert params["head"]["cls_loc"]["W"].shape == (2048, cfg.n_class * 4)
    assert params["head"]["mask"]["W"].shape == (1, 1, 256, cfg.n_fg_class)


def test_predict_step_shapes_and_bounds(tiny_model):
    cfg, params = tiny_model
    rng = np.random.RandomState(0)
    n, h, w = 2, 64, 96
    images = rng.randn(n, h, w, 3).astype(np.float32) * 10
    sizes = np.array([[60.0, 90.0], [64.0, 96.0]], np.float32)
    scales = np.array([1.0, 1.0], np.float32)

    out = jax.jit(lambda p, i, s, sc: predict_step(p, cfg, i, s, sc))(
        params, images, sizes, scales
    )
    d = cfg.detections_per_im
    assert out["boxes"].shape == (n, d, 4)
    assert out["labels"].shape == (n, d)
    assert out["mask_probs"].shape == (n, d, cfg.mask_size, cfg.mask_size)

    boxes = np.asarray(out["boxes"])
    valid = np.asarray(out["valid"])
    for i in range(n):
        b = boxes[i][valid[i]]
        assert np.all(b[:, 0] >= 0) and np.all(b[:, 1] >= 0)
        assert np.all(b[:, 2] <= sizes[i, 0] + 1e-3)
        assert np.all(b[:, 3] <= sizes[i, 1] + 1e-3)
    probs = np.asarray(out["mask_probs"])
    assert np.all((probs >= 0) & (probs <= 1))


def make_batch(cfg, n=2, h=64, w=96, g=4, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(n, h, w, 3).astype(np.float32) * 10
    bbox = np.zeros((n, g, 4), np.float32)
    label = np.zeros((n, g), np.int32)
    bbox_valid = np.zeros((n, g), bool)
    masks = np.zeros((n, g, h, w), np.uint8)
    for i in range(n):
        for j in range(rng.randint(1, g + 1)):
            y1, x1 = rng.randint(0, h - 20), rng.randint(0, w - 20)
            y2 = y1 + rng.randint(12, min(40, h - y1))
            x2 = x1 + rng.randint(12, min(40, w - x1))
            bbox[i, j] = (y1, x1, y2, x2)
            label[i, j] = rng.randint(0, cfg.n_fg_class)
            bbox_valid[i, j] = True
            masks[i, j, y1:y2, x1:x2] = 1
    return {
        "image": jnp.asarray(images),
        "bbox": jnp.asarray(bbox),
        "label": jnp.asarray(label),
        "bbox_valid": jnp.asarray(bbox_valid),
        "mask": jnp.asarray(masks),
        "scale": jnp.ones((n,), jnp.float32),
    }


def test_train_loss_finite_and_frozen_grads(tiny_model):
    cfg, params = tiny_model
    batch = make_batch(cfg)
    pt_cfg = ProposalTargetConfig(n_sample=16)

    def loss_fn(p):
        loss, metrics = train_loss(
            p, cfg, batch, jax.random.PRNGKey(0), proposal_cfg=pt_cfg
        )
        return loss, metrics

    (loss, metrics), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)

    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # freeze_at='res2': conv1 and res2 receive no gradient
    assert float(jnp.abs(grads["extractor"]["conv1"]["W"]).max()) == 0.0
    assert (
        float(
            jnp.abs(grads["extractor"]["res2"]["a"]["conv1"]["W"]).max()
        )
        == 0.0
    )
    # res3/res4, rpn, head do receive gradients
    assert float(jnp.abs(grads["extractor"]["res3"]["a"]["conv1"]["W"]).max()) > 0
    assert float(jnp.abs(grads["rpn"]["conv1"]["W"]).max()) > 0
    assert float(jnp.abs(grads["head"]["cls_loc"]["W"]).max()) > 0
    assert float(jnp.abs(grads["head"]["mask"]["W"]).max()) > 0


def test_api_predict_contract():
    model = MaskRCNNResNet(
        n_layers=50,
        n_fg_class=3,
        min_size=48,
        max_size=64,
        anchor_scales=(4.0, 8.0),
        proposal_creator_params=dict(
            n_test_pre_nms=80, n_test_post_nms=16
        ),
    )
    rng = np.random.RandomState(0)
    imgs = [
        rng.randint(0, 255, (3, 70, 90)).astype(np.float32),
        rng.randint(0, 255, (3, 50, 50)).astype(np.float32),
    ]
    bboxes, masks, labels, scores = model.predict(imgs)
    assert len(bboxes) == 2
    for i, img in enumerate(imgs):
        r = len(bboxes[i])
        assert masks[i].shape == (r, img.shape[1], img.shape[2])
        assert labels[i].shape == (r,)
        assert scores[i].shape == (r,)
        if r:
            assert masks[i].dtype == bool
            assert labels[i].min() >= 0
            assert labels[i].max() < 3


@pytest.mark.medium
def test_default_predict_compile_bound():
    """The default API (pad_to_bucket=True since r4, VERDICT r3 directive
    5) pads to the loader's static orientation buckets, so a mixed-size
    sweep through ``predict`` compiles at most two graphs (landscape +
    portrait) instead of one per distinct rounded size."""
    model = MaskRCNNResNet(
        n_layers=50,
        n_fg_class=2,
        min_size=48,
        max_size=128,
        anchor_scales=(8.0,),
        proposal_creator_params=dict(
            n_test_pre_nms=40, n_test_post_nms=8
        ),
    )
    assert model.pad_to_bucket  # the new default
    fn = model._get_predict_fn()
    base = fn._cache_size()
    rng = np.random.RandomState(0)
    sizes = [(50, 100), (55, 103), (40, 90), (62, 120), (47, 111),
             (100, 50), (90, 41)]  # 5 landscape + 2 portrait, all distinct
    for h, w in sizes:
        img = rng.randint(0, 255, (3, h, w)).astype(np.float32)
        bboxes, masks, labels, scores = model.predict([img])
        assert masks[0].shape[1:] == (h, w)
    assert fn._cache_size() - base <= 2


def test_deconv_matches_torch():
    """deconv2x2_s2 (einsum formulation) vs torch.conv_transpose2d — the
    weight-importer layouts depend on this equivalence."""
    import torch

    from mask_rcnn_tpu.models.heads import deconv2x2_s2

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 6, 8).astype(np.float32)  # NHWC
    w = rng.randn(2, 2, 8, 3).astype(np.float32)  # (kh, kw, cin, cout)
    b = rng.randn(3).astype(np.float32)

    got = np.asarray(deconv2x2_s2(jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    # torch conv_transpose2d weight: (in, out, kh, kw)
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    yt = torch.nn.functional.conv_transpose2d(
        xt, wt, bias=torch.from_numpy(b), stride=2
    )
    want = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch():
    import torch

    from mask_rcnn_tpu.models.resnet import conv2d

    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 18, 3).astype(np.float32)
    w = rng.randn(7, 7, 3, 4).astype(np.float32)  # HWIO
    got = np.asarray(
        conv2d(jnp.asarray(x), jnp.asarray(w), stride=2,
               padding=[(3, 3), (3, 3)])
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    yt = torch.nn.functional.conv2d(xt, wt, stride=2, padding=3)
    want = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.medium
def test_resnet101_params_and_train_grads():
    """R-101-C4: 23 res4 blocks (RESNET_N_BLOCKS, reference
    resnet_extractor.py ResNet101Layers), shared head/RPN. One
    value_and_grad covers the deep backbone forward+backward; the decode
    and loss paths are architecture-independent and covered by the R-50
    tests."""
    cfg = tiny_config(n_layers=101)
    params = init_params(jax.random.PRNGKey(0), cfg)
    res4 = params["extractor"]["res4"]
    assert "b22" in res4 and "b23" not in res4  # a + b1..b22 = 23 blocks
    assert "b3" in params["extractor"]["res3"]  # 4 blocks, like R-50

    batch = make_batch(cfg, n=1)
    pt_cfg = ProposalTargetConfig(n_sample=16)

    def loss_fn(p):
        return train_loss(
            p, cfg, batch, jax.random.PRNGKey(0), proposal_cfg=pt_cfg
        )

    (loss, metrics), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # gradient reaches the deepest unfrozen block; freeze cut still holds
    assert (
        float(jnp.abs(grads["extractor"]["res4"]["b22"]["conv1"]["W"]).max())
        > 0
    )
    assert float(jnp.abs(grads["extractor"]["conv1"]["W"]).max()) == 0.0


def test_low_score_thresh_rebuilds_decode_graph(tiny_model):
    """model.score_thresh below the compiled cfg.score_thresh (0.05) must
    rebuild the decode graph with the lower in-graph cutoff — the jitted
    decode drops sub-0.05 candidates before the host filter sees them, so
    without a rebuild a recall-sweep threshold like 0.01 silently returns
    the 0.05 results."""
    cfg, params = tiny_model
    model = MaskRCNNResNet.from_config(cfg, params)
    default_fn = model._get_predict_fn()
    from mask_rcnn_tpu.models.api import _compiled_predict

    assert default_fn is _compiled_predict(cfg, model.mesh)

    model.score_thresh = 0.01
    low_fn = model._get_predict_fn()
    assert low_fn is not default_fn
    # cached per threshold: a second lookup reuses the same compiled fn
    assert model._get_predict_fn() is low_fn

    # raising the threshold back above the compiled baseline restores the
    # shared graph (host-side filtering is sufficient there)
    model.score_thresh = 0.7
    assert model._get_predict_fn() is default_fn
