"""Functional ResNet-C4 backbone + res5 head block (NHWC, frozen affine BN).

Replicates the network the reference builds from chainer's
``ResNet50Layers``/``ResNet101Layers`` (models/resnet_extractor.py:47-124):

  * conv1 7x7/2 pad 3 -> affine -> relu -> maxpool 3x3/2 **pad 1** (the
    mask-rcnn quirk, resnet_extractor.py:68-69)
  * res2 (stride 1), res3 (stride 2), res4 (stride 2) -> stride-16 C4 features
  * res5 lives in the RoI head (stride ``roi_size // 7``).

BatchNorm is folded into per-channel affine (scale, bias) at weight-load time
(reference ``_convert_bn_to_affine``, resnet_extractor.py:16-44); during
training the affines are frozen, so they are plain parameters here with no
running statistics.

Bottleneck convention is caffe/chainer: the stride sits on the 1x1 ``conv1``
and the projection ``conv4`` (not on the 3x3), matching the weights the
importers target.

Parameters are nested dicts mirroring chainer link names (``res2/a/conv1/W``)
so both the chainer-npz and Detectron-pkl importers are mechanical renames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RESNET_N_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# (in, mid, out) channels for res2..res5.
STAGE_CHANNELS = {
    "res2": (64, 64, 256),
    "res3": (256, 128, 512),
    "res4": (512, 256, 1024),
    "res5": (1024, 512, 2048),
}
STAGE_STRIDES = {"res2": 1, "res3": 2, "res4": 2, "res5": 2}


def conv2d(x, w, stride=1, padding="SAME"):
    """NHWC conv; w is HWIO."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def affine(x, params):
    """Per-channel scale/bias — the frozen-BN replacement (reference
    AffineChannel2D, links/affine_channel_2d.py:8-24)."""
    return x * params["scale"] + params["bias"]


def max_pool_3x3_s2_p1(x):
    """3x3/2 max pool with pad=1 (reference resnet_extractor.py:68-69)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _stem_s2d_weight(w7):
    """Rewrite conv1's (7, 7, 3, 64) kernel for the space-to-depth-4 stem.

    The blocked conv computes, for block conv offset ``b - 1`` and output
    parity ``p``, the original tap ``d = 4(b-1) + q + 3 - 2p`` (``q`` =
    within-block position), zero where ``d`` falls outside [0, 7). Built with
    gathers so it stays differentiable in ``w7``.

    Returns a (3, 3, 48, 256) HWIO kernel; input channels ordered
    ``(qy, qx, c)``, output channels ``(py, px, o)``.
    """
    b = np.arange(3) - 1
    q = np.arange(4)
    p = np.arange(2)
    d = 4 * b[:, None, None] + q[None, :, None] + 3 - 2 * p[None, None, :]
    valid = (d >= 0) & (d < 7)  # (3, 4, 2)
    dc = jnp.asarray(np.clip(d, 0, 6).reshape(-1))

    wy = jnp.take(w7, dc, axis=0).reshape((3, 4, 2) + w7.shape[1:])
    wy = wy * jnp.asarray(valid, w7.dtype)[..., None, None, None]
    wxy = jnp.take(wy, dc, axis=3).reshape(
        (3, 4, 2, 3, 4, 2) + w7.shape[2:]
    )  # (by, qy, py, bx, qx, px, c, o)
    wxy = wxy * jnp.asarray(valid, w7.dtype)[
        None, None, None, :, :, :, None, None
    ]
    w = wxy.transpose(0, 3, 1, 4, 6, 2, 5, 7)  # (by, bx, qy, qx, c, py, px, o)
    return w.reshape(3, 3, 16 * w7.shape[2], 4 * w7.shape[3])


def stem_forward(params, x):
    """conv1 7x7/2 pad3 -> affine -> relu -> maxpool 3x3/2 pad1.

    When H and W divide by 4 (always true for the 64-aligned size buckets)
    the stem runs as a space-to-depth-4 block conv: XLA's direct conv on a
    3-channel input is far off its roofline (the C_in=3 shallow-conv path),
    while the equivalent 3x3 stride-1 conv on the (H/4, W/4, 48) block grid
    is a perfectly MXU-shaped op, and the 3x3/2 maxpool collapses to shifted
    elementwise maxes on block channels (its stride-4 output grid coincides
    with the block grid). Same terms summed per output -> equal to the
    direct path up to f32 accumulation order (~1e-7 relative).
    """
    n, h, w, c = x.shape
    if h % 4 or w % 4:
        hh = conv2d(x, params["conv1"]["W"], stride=2,
                    padding=[(3, 3), (3, 3)])
        hh = jax.nn.relu(affine(hh, params["bn1"]))
        return max_pool_3x3_s2_p1(hh)

    xb = x.reshape(n, h // 4, 4, w // 4, 4, c).transpose(
        0, 1, 3, 2, 4, 5
    ).reshape(n, h // 4, w // 4, 16 * c)
    wp = _stem_s2d_weight(params["conv1"]["W"]).astype(x.dtype)
    o1 = jax.lax.conv_general_dilated(
        xb, wp, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = jnp.tile(params["bn1"]["scale"], 4)
    bias = jnp.tile(params["bn1"]["bias"], 4)
    a = jax.nn.relu(o1 * scale + bias)  # channels (py, px, o)
    co = o1.shape[-1] // 4
    p00, p01 = a[..., 0:co], a[..., co:2 * co]
    p10, p11 = a[..., 2 * co:3 * co], a[..., 3 * co:]

    def shift_y(t):
        return jnp.concatenate(
            [jnp.full_like(t[:, :1], -jnp.inf), t[:, :-1]], axis=1
        )

    def shift_x(t):
        return jnp.concatenate(
            [jnp.full_like(t[:, :, :1], -jnp.inf), t[:, :, :-1]], axis=2
        )

    # maxpool rows {2u-1, 2u, 2u+1} = parities (1 of block u-1, 0, 1 of u)
    q0 = jnp.maximum(jnp.maximum(shift_y(p10), p00), p10)
    q1 = jnp.maximum(jnp.maximum(shift_y(p11), p01), p11)
    return jnp.maximum(jnp.maximum(shift_x(q1), q0), q1)


def bottleneck(params, x, stride=1, projection=False):
    h = conv2d(x, params["conv1"]["W"], stride=stride, padding="VALID")
    h = jax.nn.relu(affine(h, params["bn1"]))
    h = conv2d(h, params["conv2"]["W"], padding=[(1, 1), (1, 1)])
    h = jax.nn.relu(affine(h, params["bn2"]))
    h = conv2d(h, params["conv3"]["W"], padding="VALID")
    h = affine(h, params["bn3"])
    if projection:
        sc = conv2d(x, params["conv4"]["W"], stride=stride, padding="VALID")
        sc = affine(sc, params["bn4"])
    else:
        sc = x
    return jax.nn.relu(h + sc)


def building_block(params, x, n_blocks, stride):
    h = bottleneck(params["a"], x, stride=stride, projection=True)
    for i in range(1, n_blocks):
        h = bottleneck(params["b%d" % i], h)
    return h


def extractor_forward(params, x, n_layers=50, freeze_at="res2",
                      train=False, remat=False):
    """conv1 .. res4 -> (N, H/16, W/16, 1024) C4 features.

    ``freeze_at`` replicates the reference's ``unchain_backward`` after the
    named stage (resnet_extractor.py:77-90): a ``stop_gradient`` cut so the
    frozen stages get no gradients during training. ``remat`` checkpoints
    each stage (recompute activations in the backward pass) to trade FLOPs
    for HBM — enables larger per-chip batches.
    """
    blocks = RESNET_N_BLOCKS[n_layers]
    h = stem_forward(params, x)
    for i, stage in enumerate(["res2", "res3", "res4"]):
        fn = functools.partial(
            building_block, n_blocks=blocks[i],
            stride=STAGE_STRIDES[stage],
        )
        if remat and train:
            fn = jax.checkpoint(fn)
        h = fn(params[stage], h)
        if train and freeze_at == stage:
            h = jax.lax.stop_gradient(h)
    return h


def res5_forward(params, x, stride=2):
    """res5 on pooled RoI features: (R, roi_size, roi_size, 1024) ->
    (R, roi_size/stride, roi_size/stride, 2048)."""
    return building_block(params, x, RESNET_N_BLOCKS[50][3], stride)


# ---------------------------------------------------------------------------
# Initialization


def _conv_init(key, kh, kw, cin, cout, mode="he_normal"):
    fan_in = kh * kw * cin
    if mode == "he_normal":
        std = np.sqrt(2.0 / fan_in)
    else:
        std = 0.01
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _affine_init(c, scale=1.0):
    return {
        "scale": jnp.full((c,), scale, jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
    }


# From-scratch init attenuates each residual branch through its last affine.
# Real BatchNorm would renormalize activations during training; the folded
# affines here are identity (and frozen), so without attenuation a deep
# he_normal stack blows activations up exponentially (observed: init
# roi_cls_loss ~150 instead of ~ln n_class). Pretrained-weight loading
# overwrites these values, so parity paths are unaffected.
RESIDUAL_AFFINE_SCALE = 0.1


def init_bottleneck(key, cin, mid, cout, projection, mode="he_normal",
                    residual_scale=RESIDUAL_AFFINE_SCALE):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": {"W": _conv_init(ks[0], 1, 1, cin, mid, mode)},
        "bn1": _affine_init(mid),
        "conv2": {"W": _conv_init(ks[1], 3, 3, mid, mid, mode)},
        "bn2": _affine_init(mid),
        "conv3": {"W": _conv_init(ks[2], 1, 1, mid, cout, mode)},
        "bn3": _affine_init(cout, residual_scale),
    }
    if projection:
        p["conv4"] = {"W": _conv_init(ks[3], 1, 1, cin, cout, mode)}
        p["bn4"] = _affine_init(cout, residual_scale)
    return p


def init_building_block(key, stage, n_blocks, mode="he_normal"):
    cin, mid, cout = STAGE_CHANNELS[stage]
    ks = jax.random.split(key, n_blocks)
    p = {"a": init_bottleneck(ks[0], cin, mid, cout, True, mode)}
    for i in range(1, n_blocks):
        p["b%d" % i] = init_bottleneck(ks[i], cout, mid, cout, False, mode)
    return p


def init_extractor(key, n_layers=50, mode="he_normal"):
    blocks = RESNET_N_BLOCKS[n_layers]
    ks = jax.random.split(key, 4)
    params = {
        "conv1": {"W": _conv_init(ks[0], 7, 7, 3, 64, mode)},
        "bn1": _affine_init(64, 0.5),
    }
    for i, stage in enumerate(["res2", "res3", "res4"]):
        params[stage] = init_building_block(ks[i + 1], stage, blocks[i], mode)
    return params


def init_res5(key, n_layers=50, mode="he_normal"):
    return init_building_block(key, "res5", RESNET_N_BLOCKS[n_layers][3],
                               mode)
