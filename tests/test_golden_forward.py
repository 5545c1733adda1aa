"""Full-model golden forward test.

Composes *independent* pure-numpy (float64) re-derivations of every stage —
backbone convs, RPN, proposal creation, RoIAlign, res5 head, decode, the
second mask pass, and the host mask paste — into one end-to-end oracle and
compares it against the single jitted ``predict_step`` graph. Unlike the
per-op oracle tests, this exercises the *seams* between ops (layouts,
flattening orders, scale handling, the bin_stride fast path) exactly as the
reference's system-level test would (reference inference stack:
models/mask_rcnn.py:307-337 -> 152-305).

The numpy path deliberately follows the reference structure (pool 14x14 then
res5 at stride 2), NOT the jax graph's bin_stride shortcut (pool the even 7x7
subgrid, res5 stride 1) — so their agreement also validates that optimization
at full-model level.
"""

import jax
import numpy as np

from mask_rcnn_tpu.models import MaskRCNNConfig, ProposalConfig, init_params
from mask_rcnn_tpu.models.mask_rcnn import make_anchors, predict_step
from mask_rcnn_tpu.utils.masks import paste_masks
from tests.oracles import loc2bbox_np, nms_np, roi_align_np
from tests.test_decode import decode_oracle


# -- numpy network building blocks (float64, scalar-structured) -------------

def conv2d_np(x, w, stride=1, pad=0):
    """NHWC x HWIO convolution via per-output-pixel matmuls."""
    n, h, wd, _ = x.shape
    kh, kw, _, co = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((n, ho, wo, co))
    wf = w.reshape(-1, co).astype(np.float64)
    for i in range(ho):
        for j in range(wo):
            patch = xp[
                :, i * stride:i * stride + kh, j * stride:j * stride + kw, :
            ].reshape(n, -1)
            out[:, i, j, :] = patch @ wf
    return out


def affine_np(x, p):
    return x * np.asarray(p["scale"], np.float64) + np.asarray(
        p["bias"], np.float64
    )


def relu_np(x):
    return np.maximum(x, 0.0)


def maxpool_3x3_s2_p1_np(x):
    n, h, w, c = x.shape
    xp = np.full((n, h + 2, w + 2, c), -np.inf)
    xp[:, 1:-1, 1:-1] = x
    ho = (h + 2 - 3) // 2 + 1
    wo = (w + 2 - 3) // 2 + 1
    out = np.zeros((n, ho, wo, c))
    for i in range(ho):
        for j in range(wo):
            out[:, i, j] = xp[
                :, 2 * i:2 * i + 3, 2 * j:2 * j + 3
            ].max(axis=(1, 2))
    return out


def bottleneck_np(p, x, stride=1, projection=False):
    h = conv2d_np(x, np.asarray(p["conv1"]["W"]), stride=stride)
    h = relu_np(affine_np(h, p["bn1"]))
    h = conv2d_np(h, np.asarray(p["conv2"]["W"]), pad=1)
    h = relu_np(affine_np(h, p["bn2"]))
    h = conv2d_np(h, np.asarray(p["conv3"]["W"]))
    h = affine_np(h, p["bn3"])
    if projection:
        sc = conv2d_np(x, np.asarray(p["conv4"]["W"]), stride=stride)
        sc = affine_np(sc, p["bn4"])
    else:
        sc = x
    return relu_np(h + sc)


def building_block_np(p, x, n_blocks, stride):
    h = bottleneck_np(p["a"], x, stride=stride, projection=True)
    for i in range(1, n_blocks):
        h = bottleneck_np(p["b%d" % i], h)
    return h


def extractor_np(p, x):
    h = conv2d_np(x, np.asarray(p["conv1"]["W"]), stride=2, pad=3)
    h = relu_np(affine_np(h, p["bn1"]))
    h = maxpool_3x3_s2_p1_np(h)
    h = building_block_np(p["res2"], h, 3, 1)
    h = building_block_np(p["res3"], h, 4, 2)
    h = building_block_np(p["res4"], h, 6, 2)
    return h


def rpn_np(p, feats):
    n = feats.shape[0]
    h = relu_np(
        conv2d_np(feats, np.asarray(p["conv1"]["W"]), pad=1)
        + np.asarray(p["conv1"]["b"], np.float64)
    )
    locs = conv2d_np(h, np.asarray(p["loc"]["W"])) + np.asarray(
        p["loc"]["b"], np.float64
    )
    scores = conv2d_np(h, np.asarray(p["score"]["W"])) + np.asarray(
        p["score"]["b"], np.float64
    )
    return locs.reshape(n, -1, 4), scores.reshape(n, -1)


def propose_np(loc, score, anchors, img_size, cfg: ProposalConfig):
    """chainercv ProposalCreator (test mode), numpy."""
    roi = loc2bbox_np(anchors.astype(np.float64), loc)
    roi[:, 0::2] = np.clip(roi[:, 0::2], 0, img_size[0])
    roi[:, 1::2] = np.clip(roi[:, 1::2], 0, img_size[1])
    # min_size filter is a no-op at min_size=0 (the model's setting)
    order = np.argsort(-score, kind="stable")[: cfg.n_test_pre_nms]
    roi = roi[order]
    keep = nms_np(
        roi.astype(np.float32), score[order].astype(np.float32),
        cfg.nms_thresh,
    )
    return roi[keep[: cfg.n_test_post_nms]]


def head_np(p, feats, rois, roi_indices, roi_size=14):
    """Reference head path: pool the full roi_size grid, res5 at stride 2."""
    pool = roi_align_np(
        feats.astype(np.float32),
        rois.astype(np.float32),
        roi_indices,
        out_size=roi_size,
        spatial_scale=1.0 / 16,
        sampling_ratio=0,
    ).astype(np.float64)
    return building_block_np(p["res5"], pool, 3, stride=roi_size // 7)


def box_outputs_np(p, h5):
    p5 = h5.mean(axis=(1, 2))
    cls_locs = p5 @ np.asarray(p["cls_loc"]["W"], np.float64) + np.asarray(
        p["cls_loc"]["b"], np.float64
    )
    scores = p5 @ np.asarray(p["score"]["W"], np.float64) + np.asarray(
        p["score"]["b"], np.float64
    )
    return cls_locs, scores


def mask_logits_np(p, h5):
    w = np.asarray(p["deconv6"]["W"], np.float64)  # (2, 2, 2048, 256)
    d = np.einsum("nhwc,ijco->nhiwjo", h5, w)
    n, h, _, ww, _, o = d.shape
    d = d.reshape(n, h * 2, ww * 2, o) + np.asarray(
        p["deconv6"]["b"], np.float64
    )
    d = relu_np(d)
    return conv2d_np(d, np.asarray(p["mask"]["W"])) + np.asarray(
        p["mask"]["b"], np.float64
    )


def test_golden_full_model_forward():
    cfg = MaskRCNNConfig(
        n_fg_class=3,
        n_layers=50,
        min_size=64,
        max_size=96,
        anchor_scales=(1.0, 2.0, 4.0),
        proposal=ProposalConfig(n_test_pre_nms=96, n_test_post_nms=24),
        detections_per_im=8,
    )
    params = init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(3)
    h, w = 64, 96
    image = (rng.randn(1, h, w, 3) * 20).astype(np.float32)
    size = np.asarray([[60.0, 90.0]], np.float32)
    scale = np.asarray([1.12], np.float32)

    # --- jitted graph --------------------------------------------------
    out = jax.jit(
        lambda pr, im, sz, sc: predict_step(pr, cfg, im, sz, sc)
    )(params, image, size, scale)
    out = jax.device_get(out)
    got_valid = out["valid"][0]
    got_boxes = out["boxes"][0][got_valid]
    got_labels = out["labels"][0][got_valid]
    got_scores = out["scores"][0][got_valid]
    got_probs = out["mask_probs"][0][got_valid]

    # --- numpy composition of the stage oracles ------------------------
    feats = extractor_np(params["extractor"], image.astype(np.float64))
    locs, rpn_scores = rpn_np(params["rpn"], feats)
    anchors = make_anchors(cfg, feats.shape[1], feats.shape[2])
    rois = propose_np(
        locs[0], rpn_scores[0], anchors, (h, w), cfg.proposal
    )
    r = len(rois)
    assert r > 4, "fixture produced too few proposals"

    h5 = head_np(params["head"], feats, rois, np.zeros(r, np.int32))
    cls_locs, cls_scores = box_outputs_np(params["head"], h5)
    want_boxes, want_labels, want_scores = decode_oracle(
        cfg, rois, cls_locs, cls_scores, size[0], float(scale[0])
    )
    assert len(want_boxes) > 0, "oracle produced no detections"

    # second head pass on the detected boxes, reference _to_roi_masks
    mrois = want_boxes * float(scale[0])
    h5m = head_np(
        params["head"], feats, mrois, np.zeros(len(mrois), np.int32)
    )
    logits = mask_logits_np(params["head"], h5m)
    sel = logits[np.arange(len(mrois)), :, :, want_labels]
    want_probs = 1.0 / (1.0 + np.exp(-sel))

    # --- compare --------------------------------------------------------
    assert len(got_boxes) == len(want_boxes)
    np.testing.assert_array_equal(got_labels, want_labels)
    np.testing.assert_allclose(got_scores, want_scores, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-2, atol=0.2)
    np.testing.assert_allclose(got_probs, want_probs, rtol=0.0, atol=5e-3)

    # host paste seam: identical inputs -> identical full-image masks up to
    # pixels whose interpolated probability sits at the 0.5 knife edge.
    im_h, im_w = int(size[0, 0]), int(size[0, 1])
    got_masks = paste_masks(
        got_boxes.astype(np.float32), got_probs.astype(np.float32),
        im_h, im_w,
    )
    want_masks = paste_masks(
        want_boxes.astype(np.float32), want_probs.astype(np.float32),
        im_h, im_w,
    )
    diff = np.logical_xor(got_masks, want_masks).mean()
    assert diff < 5e-3, f"pasted masks differ on {diff:.2%} of pixels"
