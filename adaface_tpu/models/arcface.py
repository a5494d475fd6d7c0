"""ArcFace resnet_face18 — differentiable identity embeddings.

JAX rebuild of `evaluation/arcface_resnet.py` (resnet_face18 = ResNetFace
with IRBlocks [2,2,2,2] + SE, shared with the training-time identity loss
via `ldm/modules/arcface_wrapper.py`): grayscale 128×128 input → 512-d
embedding. Inference-mode BatchNorm (running statistics are parameters);
the network is always frozen in this framework, only gradients *through*
it are needed for the ArcFace alignment loss.

Checkpoint conversion from the torch `arcface-resnet18_110.pth` layout is
in `convert_arcface_state_dict`.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

LAYERS = [2, 2, 2, 2]
CHANNELS = [64, 128, 256, 512]
STRIDES = [1, 2, 2, 2]


def _conv_init(rng, kh, kw, cin, cout):
    std = math.sqrt(2.0 / (kh * kw * cin))
    return {"w": jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std}


def _bn_init(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _prelu_init():
    return {"a": jnp.full((1,), 0.25, jnp.float32)}


def _conv(p, x, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bn(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = (xf - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _prelu(p, x):
    a = p["a"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _init_se(rng, c, reduction=16):
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": {"w": jax.random.normal(k1, (c, c // reduction)) / math.sqrt(c),
                "b": jnp.zeros((c // reduction,))},
        "prelu": _prelu_init(),
        "fc2": {"w": jax.random.normal(k2, (c // reduction, c)) / math.sqrt(c // reduction),
                "b": jnp.zeros((c,))},
    }


def _se(p, x):
    s = x.mean(axis=(1, 2))  # [B, C]
    s = s @ p["fc1"]["w"].astype(x.dtype) + p["fc1"]["b"].astype(x.dtype)
    s = _prelu(p["prelu"], s)
    s = s @ p["fc2"]["w"].astype(x.dtype) + p["fc2"]["b"].astype(x.dtype)
    s = jax.nn.sigmoid(s)
    return x * s[:, None, None, :]


def _init_irblock(rng, cin, cout, stride, use_se=True):
    ks = iter(jax.random.split(rng, 5))
    p = {
        "bn0": _bn_init(cin),
        "conv1": _conv_init(next(ks), 3, 3, cin, cin),
        "bn1": _bn_init(cin),
        "prelu": _prelu_init(),
        "conv2": _conv_init(next(ks), 3, 3, cin, cout),
        "bn2": _bn_init(cout),
    }
    if use_se:
        p["se"] = _init_se(next(ks), cout)
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": _conv_init(next(ks), 1, 1, cin, cout),
            "bn": _bn_init(cout),
        }
    return p


def _irblock(p, x, stride):
    out = _bn(p["bn0"], x)
    out = _conv(p["conv1"], out)
    out = _prelu(p["prelu"], _bn(p["bn1"], out))
    out = _conv(p["conv2"], out, stride=stride)
    out = _bn(p["bn2"], out)
    if "se" in p:
        out = _se(p["se"], out)
    residual = x
    if "downsample" in p:
        residual = _bn(p["downsample"]["bn"],
                       _conv(p["downsample"]["conv"], x, stride=stride, padding=0))
    return _prelu(p["prelu"], out + residual)


def init_arcface_params(rng: jax.Array, use_se: bool = True,
                        layers: tuple | None = None) -> Params:
    """`layers` overrides per-stage block counts (default resnet_face18's
    [2,2,2,2]); stage channels/strides are fixed so any depth keeps the
    128→8×8 spatial contract (`arcface_embed` adapts to the param tree).
    Shallow settings exist for compile-budgeted dry runs, not inference."""
    layer_counts = LAYERS if layers is None else layers
    ks = iter(jax.random.split(rng, 32))
    p: Params = {
        "conv1": _conv_init(next(ks), 3, 3, 1, 64),
        "bn1": _bn_init(64),
        "prelu": _prelu_init(),
        "layers": [],
        "bn4": _bn_init(512),
        "fc5": {"w": jax.random.normal(next(ks), (512 * 8 * 8, 512)) * 0.01,
                "b": jnp.zeros((512,))},
        "bn5": _bn_init(512),
    }
    cin = 64
    for planes, n, stride in zip(CHANNELS, layer_counts, STRIDES):
        blocks = []
        blocks.append(_init_irblock(next(ks), cin, planes, stride, use_se))
        cin = planes
        for _ in range(1, n):
            blocks.append(_init_irblock(next(ks), cin, planes, 1, use_se))
        p["layers"].append(blocks)
    return p


def arcface_embed(params: Params, x: jax.Array) -> jax.Array:
    """x: [B, 1, 128, 128] grayscale in [-1, 1] → [B, 512] embeddings."""
    h = x.transpose(0, 2, 3, 1)  # NHWC
    h = _conv(params["conv1"], h)
    h = _prelu(params["prelu"], _bn(params["bn1"], h))
    h = -jax.lax.reduce_window(  # 2x2 max pool
        -h, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    for blocks, stride in zip(params["layers"], STRIDES):
        h = _irblock(blocks[0], h, stride)
        for blk in blocks[1:]:
            h = _irblock(blk, h, 1)
    h = _bn(params["bn4"], h)
    b = h.shape[0]
    # torch flattens NCHW: [B, C, H, W] → [B, C*H*W]
    flat = h.transpose(0, 3, 1, 2).reshape(b, -1)
    out = flat @ params["fc5"]["w"].astype(flat.dtype) + params["fc5"]["b"].astype(flat.dtype)
    # bn5 is a 1-d BatchNorm over features
    out = (out.astype(jnp.float32) - params["bn5"]["mean"]) * jax.lax.rsqrt(
        params["bn5"]["var"] + 1e-5)
    out = out * params["bn5"]["scale"] + params["bn5"]["bias"]
    return out


def convert_arcface_state_dict(sd: Mapping[str, np.ndarray],
                               use_se: bool = True) -> Params:
    """torch resnet_face18 state dict → params."""

    def conv(prefix):
        return {"w": jnp.asarray(
            np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0).copy())}

    def bn(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
            "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}.running_var"]),
        }

    def prelu(prefix):
        return {"a": jnp.asarray(sd[f"{prefix}.weight"]).reshape(-1)}

    def linear(prefix):
        return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T.copy()),
                "b": jnp.asarray(sd[f"{prefix}.bias"])}

    def se(prefix):
        return {
            "fc1": linear(f"{prefix}.fc.0"),
            "prelu": prelu(f"{prefix}.fc.1"),
            "fc2": linear(f"{prefix}.fc.2"),
        }

    def irblock(prefix):
        p = {
            "bn0": bn(f"{prefix}.bn0"),
            "conv1": conv(f"{prefix}.conv1"),
            "bn1": bn(f"{prefix}.bn1"),
            "prelu": prelu(f"{prefix}.prelu"),
            "conv2": conv(f"{prefix}.conv2"),
            "bn2": bn(f"{prefix}.bn2"),
        }
        if use_se:
            p["se"] = se(f"{prefix}.se")
        if f"{prefix}.downsample.0.weight" in sd:
            p["downsample"] = {"conv": conv(f"{prefix}.downsample.0"),
                               "bn": bn(f"{prefix}.downsample.1")}
        return p

    params: Params = {
        "conv1": conv("conv1"),
        "bn1": bn("bn1"),
        "prelu": prelu("prelu"),
        "layers": [],
        "bn4": bn("bn4"),
        "fc5": linear("fc5"),
        "bn5": bn("bn5"),
    }
    for li, n in enumerate(LAYERS, start=1):
        params["layers"].append(
            [irblock(f"layer{li}.{bi}") for bi in range(n)])
    return params
