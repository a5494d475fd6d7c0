"""BiSeNet face parser (19 classes), functional JAX.

Rebuild of `face_parsing/model.py` (BiSeNet-ResNet18): ResNet18 context
path with attention-refinement modules (ARM) and a global context tail,
feature-fusion module (FFM), 19 face-part classes. Used offline to
generate `*_mask.png` training masks (`gen_masks.py` /
`scripts-private/gen_face_masks.py`).

Inference uses frozen-statistics BN; the training path (the reference
trains this with the InPlace-ABN native extension) uses our fused Pallas
BN+activation (`ops/fused_norm.py`) when `train=True`.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.fused_norm import fused_bn_act
from adaface_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest

Params = dict[str, Any]

N_CLASSES = 19
# face-parsing class ids (CelebAMask-HQ convention): skin 1 … neck 14 etc.
FACE_CLASS_IDS = tuple(range(1, 14))


def _conv_init(rng, kh, kw, cin, cout):
    std = math.sqrt(2.0 / (kh * kw * cin))
    return {"w": jax.random.normal(rng, (kh, kw, cin, cout)) * std}


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv(p, x, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)] if isinstance(padding, int)
        else padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn(p, x, train=False, relu=True):
    if train:
        y = fused_bn_act(x, p["scale"], p["bias"],
                         slope=(0.0 if relu else 1.0))
        return y
    xf = x.astype(jnp.float32)
    y = (xf - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5)
    y = y * p["scale"] + p["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _init_convbnrelu(rng, cin, cout, k=3):
    return {"conv": _conv_init(rng, k, k, cin, cout), "bn": _bn_init(cout)}


def _convbnrelu(p, x, stride=1, k=3, train=False):
    return _bn(p["bn"], _conv(p["conv"], x, stride, k // 2), train=train)


def _init_basicblock(rng, cin, cout, stride):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {"conv1": _conv_init(k1, 3, 3, cin, cout), "bn1": _bn_init(cout),
         "conv2": _conv_init(k2, 3, 3, cout, cout), "bn2": _bn_init(cout)}
    if stride != 1 or cin != cout:
        p["down"] = {"conv": _conv_init(k3, 1, 1, cin, cout),
                     "bn": _bn_init(cout)}
    return p


def _basicblock(p, x, stride, train=False):
    h = _bn(p["bn1"], _conv(p["conv1"], x, stride), train=train)
    h = _bn(p["bn2"], _conv(p["conv2"], h), train=train, relu=False)
    sc = x
    if "down" in p:
        sc = _bn(p["down"]["bn"], _conv(p["down"]["conv"], x, stride, 0),
                 train=train, relu=False)
    return jnp.maximum(h + sc, 0.0)


def _init_arm(rng, cin, cout):
    k1, k2 = jax.random.split(rng)
    return {"conv": _init_convbnrelu(k1, cin, cout),
            "atten": {"conv": _conv_init(k2, 1, 1, cout, cout),
                      "bn": _bn_init(cout)}}


def _arm(p, x, train=False):
    feat = _convbnrelu(p["conv"], x, train=train)
    att = feat.mean(axis=(1, 2), keepdims=True)
    att = _conv(p["atten"]["conv"], att, padding=0)
    att = _bn(p["atten"]["bn"], att, train=train, relu=False)
    return feat * jax.nn.sigmoid(att)


def init_bisenet_params(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 40))
    p: Params = {
        # resnet18 stem
        "conv1": _conv_init(next(ks), 7, 7, 3, 64),
        "bn1": _bn_init(64),
        "layers": [],
        # context path
        "arm16": _init_arm(next(ks), 256, 128),
        "arm32": _init_arm(next(ks), 512, 128),
        "conv_head16": _init_convbnrelu(next(ks), 128, 128),
        "conv_head32": _init_convbnrelu(next(ks), 128, 128),
        "conv_avg": _init_convbnrelu(next(ks), 512, 128, k=1),
        # FFM
        "ffm": {
            "convblk": _init_convbnrelu(next(ks), 256, 256, k=1),
            "conv1": _conv_init(next(ks), 1, 1, 256, 64),
            "conv2": _conv_init(next(ks), 1, 1, 64, 256),
        },
        # output heads (main + 2 aux)
        "out": {"conv": _init_convbnrelu(next(ks), 256, 256),
                "cls": _conv_init(next(ks), 1, 1, 256, N_CLASSES)},
        "out16": {"conv": _init_convbnrelu(next(ks), 128, 64),
                  "cls": _conv_init(next(ks), 1, 1, 64, N_CLASSES)},
        "out32": {"conv": _init_convbnrelu(next(ks), 128, 64),
                  "cls": _conv_init(next(ks), 1, 1, 64, N_CLASSES)},
    }
    cin = 64
    for cout, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
        blocks = [_init_basicblock(next(ks), cin, cout, stride),
                  _init_basicblock(next(ks), cout, cout, 1)]
        p["layers"].append(blocks)
        cin = cout
    return p


def _upsample_to(x, h, w):
    return resize_nearest(x, (h, w), spatial_axes=(1, 2))


def bisenet_forward(params: Params, x: jax.Array, train: bool = False):
    """x: [B, 3, H, W] normalized (imagenet) → logits [B, 19, H, W]
    (+ aux16/aux32 heads when train=True)."""
    x = x.transpose(0, 2, 3, 1)
    b, H, W, _ = x.shape
    h = _bn(params["bn1"], _conv(params["conv1"], x, 2, 3), train=train)
    # torch MaxPool2d(3, 2, padding=1): symmetric (1,1) pads — XLA "SAME"
    # would pad (0,1) here, shifting everything by one pixel
    h = -jax.lax.reduce_window(-h, jnp.inf, jax.lax.min,
                               (1, 3, 3, 1), (1, 2, 2, 1),
                               ((0, 0), (1, 1), (1, 1), (0, 0)))
    feats = []
    for blocks, stride in zip(params["layers"], (1, 2, 2, 2)):
        h = _basicblock(blocks[0], h, stride, train=train)
        h = _basicblock(blocks[1], h, 1, train=train)
        feats.append(h)
    feat8, feat16, feat32 = feats[1], feats[2], feats[3]

    # global context tail
    avg = feat32.mean(axis=(1, 2), keepdims=True)
    avg = _convbnrelu(params["conv_avg"], avg, k=1, train=train)
    avg_up = jnp.broadcast_to(avg, (b, *feat32.shape[1:3], avg.shape[-1]))

    f32 = _arm(params["arm32"], feat32, train=train) + avg_up
    f32_up = _upsample_to(f32, *feat16.shape[1:3])
    f32_up = _convbnrelu(params["conv_head32"], f32_up, train=train)

    f16 = _arm(params["arm16"], feat16, train=train) + f32_up
    f16_up = _upsample_to(f16, *feat8.shape[1:3])
    f16_up = _convbnrelu(params["conv_head16"], f16_up, train=train)

    # FFM: fuse the (reused) spatial features feat8 with the context
    fcat = jnp.concatenate([feat8, f16_up], axis=-1)
    feat = _convbnrelu(params["ffm"]["convblk"], fcat, k=1, train=train)
    att = feat.mean(axis=(1, 2), keepdims=True)
    att = jnp.maximum(_conv(params["ffm"]["conv1"], att, padding=0), 0.0)
    att = jax.nn.sigmoid(_conv(params["ffm"]["conv2"], att, padding=0))
    feat = feat * att + feat

    def head(hp, f):
        o = _convbnrelu(hp["conv"], f, train=train)
        o = _conv(hp["cls"], o, padding=0)
        # final logits upsample is bilinear align_corners=True in the
        # reference (`model.py:251-253`); internal fusions stay nearest
        o = resize_bilinear_align_corners(o, (H, W), spatial_axes=(1, 2))
        return o.transpose(0, 3, 1, 2)

    out = head(params["out"], feat)
    if train:
        return out, head(params["out16"], f16_up), head(params["out32"], f32_up)
    return out


def parsing_to_face_mask(parsing: np.ndarray,
                         face_classes=FACE_CLASS_IDS) -> np.ndarray:
    """argmax parsing [H, W] → binary face mask (skin+features), the
    binarization step of `gen_masks.py`."""
    return np.isin(parsing, np.asarray(face_classes)).astype(np.uint8) * 255


def convert_bisenet_state_dict(sd: Mapping[str, np.ndarray]) -> Params:
    """torch face-parsing BiSeNet ckpt (`79999_iter.pth` layout) → params."""

    def conv(pre):
        return {"w": jnp.asarray(
            np.asarray(sd[f"{pre}.weight"]).transpose(2, 3, 1, 0).copy())}

    def bn(pre):
        return {"scale": jnp.asarray(sd[f"{pre}.weight"]),
                "bias": jnp.asarray(sd[f"{pre}.bias"]),
                "mean": jnp.asarray(sd[f"{pre}.running_mean"]),
                "var": jnp.asarray(sd[f"{pre}.running_var"])}

    def cbr(pre):
        return {"conv": conv(f"{pre}.conv"), "bn": bn(f"{pre}.bn")}

    def block(pre):
        p = {"conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
             "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2")}
        if f"{pre}.downsample.0.weight" in sd:
            p["down"] = {"conv": conv(f"{pre}.downsample.0"),
                         "bn": bn(f"{pre}.downsample.1")}
        return p

    cp = "cp.resnet"
    params: Params = {
        "conv1": conv(f"{cp}.conv1"), "bn1": bn(f"{cp}.bn1"), "layers": [],
        "arm16": {"conv": cbr("cp.arm16.conv"),
                  "atten": {"conv": conv("cp.arm16.conv_atten"),
                            "bn": bn("cp.arm16.bn_atten")}},
        "arm32": {"conv": cbr("cp.arm32.conv"),
                  "atten": {"conv": conv("cp.arm32.conv_atten"),
                            "bn": bn("cp.arm32.bn_atten")}},
        "conv_head16": cbr("cp.conv_head16"),
        "conv_head32": cbr("cp.conv_head32"),
        "conv_avg": cbr("cp.conv_avg"),
        "ffm": {"convblk": cbr("ffm.convblk"),
                "conv1": conv("ffm.conv1"), "conv2": conv("ffm.conv2")},
        "out": {"conv": cbr("conv_out.conv"),
                "cls": conv("conv_out.conv_out")},
        "out16": {"conv": cbr("conv_out16.conv"),
                  "cls": conv("conv_out16.conv_out")},
        "out32": {"conv": cbr("conv_out32.conv"),
                  "cls": conv("conv_out32.conv_out")},
    }
    for li in range(1, 5):
        params["layers"].append(
            [block(f"{cp}.layer{li}.{bi}") for bi in range(2)])
    return params
