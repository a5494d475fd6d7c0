"""RetinaFace detector (MobileNet-0.25 backbone), functional JAX.

JAX port of the RetinaFace face detector consumed by the reference through
the pip `retinaface_pytorch` package (`evaluation/retinaface_pytorch.py`
`RetinaFaceClient.detect_faces/crop_faces`): MobileNetV1-0.25 backbone →
3-level FPN → SSH context modules → class/bbox/landmark heads, prior-box
anchor decoding and host-side NMS. The torch checkpoint layout
(`mobilenet0.25_Final.pth` from the standard Pytorch_Retinaface release)
converts via `convert_retinaface_state_dict`.

The detector runs on TPU or CPU; box selection/NMS runs host-side numpy
(detection output feeds the host planner, never gradients — gradients flow
through the separate `train/face_losses.bilinear_crop`).
"""

from __future__ import annotations

import math
from itertools import product
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

MIN_SIZES = [[16, 32], [64, 128], [256, 512]]
STEPS = [8, 16, 32]
VARIANCES = (0.1, 0.2)
FPN_CH = 64


def _conv_init(rng, kh, kw, cin, cout, groups=1):
    std = math.sqrt(2.0 / (kh * kw * cin / groups))
    return {"w": jax.random.normal(rng, (kh, kw, cin // groups, cout)) * std}


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv(p, x, stride=1, padding=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn(p, x, leaky=0.0):
    xf = x.astype(jnp.float32)
    y = (xf - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5)
    y = y * p["scale"] + p["bias"]
    if leaky >= 0:
        y = jnp.where(y >= 0, y, y * leaky)
    return y.astype(x.dtype)


def _init_conv_bn(rng, cin, cout, stride=1, k=3):
    return {"conv": _conv_init(rng, k, k, cin, cout), "bn": _bn_init(cout)}


def _init_dw(rng, cin, cout, stride):
    k1, k2 = jax.random.split(rng)
    return {
        "dw": {"conv": _conv_init(k1, 3, 3, cin, cin, groups=cin),
               "bn": _bn_init(cin)},
        "pw": {"conv": _conv_init(k2, 1, 1, cin, cout), "bn": _bn_init(cout)},
    }


def _dw(p, x, stride, leaky=0.1):
    c = x.shape[-1]
    h = _conv(p["dw"]["conv"], x, stride=stride, groups=c)
    h = _bn(p["dw"]["bn"], h, leaky)
    h = _conv(p["pw"]["conv"], h, padding=0)
    return _bn(p["pw"]["bn"], h, leaky)


def init_retinaface_params(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 64))
    # MobileNetV1-0.25 stages (Pytorch_Retinaface layout)
    stage1 = {
        "0": _init_conv_bn(next(ks), 3, 8, 2),  # conv_bn
        **{str(i): _init_dw(next(ks), cin, cout, s)
           for i, (cin, cout, s) in enumerate(
               [(8, 16, 1), (16, 32, 2), (32, 32, 1), (32, 64, 2),
                (64, 64, 1)], start=1)},
    }
    stage2 = {str(i): _init_dw(next(ks), cin, cout, s)
              for i, (cin, cout, s) in enumerate(
                  [(64, 128, 2), (128, 128, 1), (128, 128, 1),
                   (128, 128, 1), (128, 128, 1), (128, 128, 1)])}
    stage3 = {str(i): _init_dw(next(ks), cin, cout, s)
              for i, (cin, cout, s) in enumerate(
                  [(128, 256, 2), (256, 256, 1)])}

    def ssh(rng):
        k = iter(jax.random.split(rng, 5))
        return {
            "conv3x3": _init_conv_bn(next(k), FPN_CH, FPN_CH // 2),
            "conv5x5_1": _init_conv_bn(next(k), FPN_CH, FPN_CH // 4),
            "conv5x5_2": _init_conv_bn(next(k), FPN_CH // 4, FPN_CH // 4),
            "conv7x7_2": _init_conv_bn(next(k), FPN_CH // 4, FPN_CH // 4),
            "conv7x7_3": _init_conv_bn(next(k), FPN_CH // 4, FPN_CH // 4),
        }

    n_anchors = 2
    heads = {}
    for name, cout in (("class", n_anchors * 2), ("bbox", n_anchors * 4),
                       ("landmark", n_anchors * 10)):
        heads[name] = [
            {"conv": _conv_init(next(ks), 1, 1, FPN_CH, cout),
             "b": jnp.zeros((cout,))}
            for _ in range(3)
        ]
    return {
        "body": {"stage1": stage1, "stage2": stage2, "stage3": stage3},
        "fpn": {
            "output1": _init_conv_bn(next(ks), 64, FPN_CH, k=1),
            "output2": _init_conv_bn(next(ks), 128, FPN_CH, k=1),
            "output3": _init_conv_bn(next(ks), 256, FPN_CH, k=1),
            "merge1": _init_conv_bn(next(ks), FPN_CH, FPN_CH),
            "merge2": _init_conv_bn(next(ks), FPN_CH, FPN_CH),
        },
        "ssh": [ssh(next(ks)) for _ in range(3)],
        "heads": heads,
    }


def _ssh_forward(p, x):
    c3 = _bn(p["conv3x3"]["bn"], _conv(p["conv3x3"]["conv"], x), leaky=-1)
    c51 = _bn(p["conv5x5_1"]["bn"], _conv(p["conv5x5_1"]["conv"], x), 0.1)
    c5 = _bn(p["conv5x5_2"]["bn"], _conv(p["conv5x5_2"]["conv"], c51), leaky=-1)
    c71 = _bn(p["conv7x7_2"]["bn"], _conv(p["conv7x7_2"]["conv"], c51), 0.1)
    c7 = _bn(p["conv7x7_3"]["bn"], _conv(p["conv7x7_3"]["conv"], c71), leaky=-1)
    return jnp.maximum(jnp.concatenate([c3, c5, c7], axis=-1), 0.0)


def retinaface_forward(params: Params, images: jax.Array):
    """images [B, 3, H, W] (BGR, mean-subtracted (104,117,123)) →
    (loc [B, A, 4], conf [B, A, 2], landms [B, A, 10])."""
    x = images.transpose(0, 2, 3, 1)
    p = params["body"]
    h = _bn(p["stage1"]["0"]["bn"], _conv(p["stage1"]["0"]["conv"], x, 2), 0.1)
    for i, s in zip(range(1, 6), [1, 2, 1, 2, 1]):
        h = _dw(p["stage1"][str(i)], h, s)
    c3 = h
    for i, s in zip(range(6), [2, 1, 1, 1, 1, 1]):
        h = _dw(p["stage2"][str(i)], h, s)
    c4 = h
    for i, s in zip(range(2), [2, 1]):
        h = _dw(p["stage3"][str(i)], h, s)
    c5 = h

    f = params["fpn"]
    o1 = _bn(f["output1"]["bn"], _conv(f["output1"]["conv"], c3, padding=0), 0.1)
    o2 = _bn(f["output2"]["bn"], _conv(f["output2"]["conv"], c4, padding=0), 0.1)
    o3 = _bn(f["output3"]["bn"], _conv(f["output3"]["conv"], c5, padding=0), 0.1)
    from adaface_tpu.ops.resize import resize_nearest

    up3 = resize_nearest(o3, o2.shape[1:3], spatial_axes=(1, 2))
    o2 = _bn(f["merge2"]["bn"], _conv(f["merge2"]["conv"], o2 + up3), 0.1)
    up2 = resize_nearest(o2, o1.shape[1:3], spatial_axes=(1, 2))
    o1 = _bn(f["merge1"]["bn"], _conv(f["merge1"]["conv"], o1 + up2), 0.1)

    feats = [_ssh_forward(params["ssh"][i], o)
             for i, o in enumerate((o1, o2, o3))]

    def head(name, idx, feat, per_anchor):
        hp = params["heads"][name][idx]
        y = _conv(hp["conv"], feat, padding=0) + hp["b"]
        b = y.shape[0]
        return y.reshape(b, -1, per_anchor)

    loc = jnp.concatenate([head("bbox", i, f_, 4)
                           for i, f_ in enumerate(feats)], axis=1)
    conf = jnp.concatenate([head("class", i, f_, 2)
                            for i, f_ in enumerate(feats)], axis=1)
    landms = jnp.concatenate([head("landmark", i, f_, 10)
                              for i, f_ in enumerate(feats)], axis=1)
    return loc, jax.nn.softmax(conf, axis=-1), landms


def prior_boxes(image_size: tuple[int, int]) -> np.ndarray:
    """[A, 4] anchors (cx, cy, w, h), normalized (prior-box protocol)."""
    h, w = image_size
    anchors = []
    for k, (step, sizes) in enumerate(zip(STEPS, MIN_SIZES)):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i, j in product(range(fh), range(fw)):
            for ms in sizes:
                s_kx = ms / w
                s_ky = ms / h
                cx = (j + 0.5) * step / w
                cy = (i + 0.5) * step / h
                anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """SSD-style decode → [A, 4] (x0, y0, x1, y1), normalized."""
    v0, v1 = VARIANCES
    cxy = priors[:, :2] + loc[:, :2] * v0 * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * v1)
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    return boxes


def nms(boxes: np.ndarray, scores: np.ndarray, thres: float = 0.4) -> list[int]:
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter + 1e-9)
        order = rest[iou <= thres]
    return keep


class RetinaFaceClient:
    """detect_faces / crop_faces protocol of the reference client
    (`evaluation/retinaface_pytorch.py:71-245`)."""

    BGR_MEAN = np.asarray([104.0, 117.0, 123.0], np.float32)

    def __init__(self, params: Params | None = None, rng=None):
        self.params = params if params is not None else init_retinaface_params(
            rng if rng is not None else jax.random.PRNGKey(0))
        self._fwd = jax.jit(lambda p, x: retinaface_forward(p, x))
        self._priors: dict[tuple[int, int], np.ndarray] = {}

    def detect_faces(
        self, image_rgb: np.ndarray, conf_thres: float = 0.5, T: int = 20,
    ) -> list[dict]:
        """HWC uint8 RGB → list of {'bbox': (x0,y0,x1,y1), 'score': s},
        largest-first, faces below T pixels dropped."""
        h, w = image_rgb.shape[:2]
        bgr = image_rgb[..., ::-1].astype(np.float32) - self.BGR_MEAN
        x = jnp.asarray(bgr.transpose(2, 0, 1)[None])
        loc, conf, _ = self._fwd(self.params, x)
        loc = np.asarray(loc[0])
        scores = np.asarray(conf[0, :, 1])
        if (h, w) not in self._priors:
            self._priors[(h, w)] = prior_boxes((h, w))
        boxes = decode_boxes(loc, self._priors[(h, w)])
        boxes = boxes * np.asarray([w, h, w, h])
        keep = scores > conf_thres
        boxes, scores = boxes[keep], scores[keep]
        if len(boxes) == 0:
            return []
        kept = nms(boxes, scores)
        out = []
        for i in kept:
            x0, y0, x1, y1 = boxes[i]
            if (x1 - x0) < T or (y1 - y0) < T:
                continue
            out.append({"bbox": (float(max(x0, 0)), float(max(y0, 0)),
                                 float(min(x1, w)), float(min(y1, h))),
                        "score": float(scores[i])})
        out.sort(key=lambda f: -(f["bbox"][2] - f["bbox"][0])
                 * (f["bbox"][3] - f["bbox"][1]))
        return out

    def crop_faces(self, images: np.ndarray, out_size=(128, 128), T=20):
        """[B, 3, H, W] in [-1,1] → (fg_bboxes [B,4], confidences [B],
        detected [B]); crops themselves are taken differentiably in-graph
        by `train/face_losses.bilinear_crop`."""
        b, _, h, w = images.shape
        imgs = ((images.transpose(0, 2, 3, 1) + 1) * 127.5).clip(0, 255)
        bboxes = np.zeros((b, 4), np.float32)
        confs = np.zeros((b,), np.float32)
        detected = np.zeros((b,), np.float32)
        for i in range(b):
            faces = self.detect_faces(imgs[i].astype(np.uint8), T=T)
            if faces:
                bboxes[i] = faces[0]["bbox"]
                confs[i] = faces[0]["score"]
                detected[i] = 1.0
            else:
                bboxes[i] = (0, 0, w, h)
        return bboxes, confs, detected


def convert_retinaface_state_dict(sd: Mapping[str, np.ndarray]) -> Params:
    """Pytorch_Retinaface mobilenet0.25 state dict → params."""

    def conv(pre, groups=1):
        w = np.asarray(sd[f"{pre}.weight"])
        # torch [O, I/g, kh, kw] → HWIO with grouped I/g
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0).copy())}

    def bn(pre):
        return {"scale": jnp.asarray(sd[f"{pre}.weight"]),
                "bias": jnp.asarray(sd[f"{pre}.bias"]),
                "mean": jnp.asarray(sd[f"{pre}.running_mean"]),
                "var": jnp.asarray(sd[f"{pre}.running_var"])}

    def conv_bn(pre):
        return {"conv": conv(f"{pre}.0"), "bn": bn(f"{pre}.1")}

    def dw(pre):
        return {"dw": {"conv": conv(f"{pre}.0", groups=-1), "bn": bn(f"{pre}.1")},
                "pw": {"conv": conv(f"{pre}.3"), "bn": bn(f"{pre}.4")}}

    body = {"stage1": {"0": conv_bn("body.stage1.0")},
            "stage2": {}, "stage3": {}}
    for i in range(1, 6):
        body["stage1"][str(i)] = dw(f"body.stage1.{i}")
    for i in range(6):
        body["stage2"][str(i)] = dw(f"body.stage2.{i}")
    for i in range(2):
        body["stage3"][str(i)] = dw(f"body.stage3.{i}")

    def ssh(pre):
        return {
            "conv3x3": conv_bn(f"{pre}.conv3X3"),
            "conv5x5_1": conv_bn(f"{pre}.conv5X5_1"),
            "conv5x5_2": conv_bn(f"{pre}.conv5X5_2"),
            "conv7x7_2": conv_bn(f"{pre}.conv7X7_2"),
            "conv7x7_3": conv_bn(f"{pre}.conv7x7_3"),
        }

    heads = {}
    for name, torch_name in (("class", "ClassHead"), ("bbox", "BboxHead"),
                             ("landmark", "LandmarkHead")):
        heads[name] = []
        for i in range(3):
            pre = f"{torch_name}.{i}.conv1x1"
            heads[name].append({
                "conv": conv(pre),
                "b": jnp.asarray(sd[f"{pre}.bias"]),
            })
    return {
        "body": body,
        "fpn": {
            "output1": conv_bn("fpn.output1"),
            "output2": conv_bn("fpn.output2"),
            "output3": conv_bn("fpn.output3"),
            "merge1": conv_bn("fpn.merge1"),
            "merge2": conv_bn("fpn.merge2"),
        },
        "ssh": [ssh(f"ssh{i}") for i in (1, 2, 3)],
        "heads": heads,
    }
