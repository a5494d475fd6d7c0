"""Generic pre-norm ViT (DINO ViT-S/16 for the eval harness).

Rebuild of the evaluator backbone used by `evaluation/dino_eval.py`
(facebook/dino-vits16: patch 16, width 384, 12 layers, 6 heads, CLS-token
output, GELU MLP, pre-LN blocks). Includes a converter from the torch
`facebookresearch/dino` / HF `ViTModel` state-dict layouts.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 16
    image_size: int = 224
    layer_norm_eps: float = 1e-6


DINO_VITS16 = ViTConfig()


def _ln_p(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _dense(rng, cin, cout):
    return {"w": jax.random.normal(rng, (cin, cout)) / math.sqrt(cin),
            "b": jnp.zeros((cout,))}


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_vit_params(rng: jax.Array, cfg: ViTConfig = DINO_VITS16) -> Params:
    ks = iter(jax.random.split(rng, cfg.num_layers * 6 + 4))
    d = cfg.hidden_size
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    p: Params = {
        "cls_token": jax.random.normal(next(ks), (1, 1, d)) * 0.02,
        "patch_embedding": {
            "w": jax.random.normal(
                next(ks), (d, 3, cfg.patch_size, cfg.patch_size)) * 0.02,
            "b": jnp.zeros((d,)),
        },
        "position_embedding": jax.random.normal(next(ks), (n_patches + 1, d)) * 0.02,
        "layers": [],
        "final_ln": _ln_p(d),
    }
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "ln1": _ln_p(d),
            "attn": {
                "qkv": _dense(next(ks), d, 3 * d),
                "proj": _dense(next(ks), d, d),
            },
            "ln2": _ln_p(d),
            "mlp": {
                "fc1": _dense(next(ks), d, d * cfg.mlp_ratio),
                "fc2": _dense(next(ks), d * cfg.mlp_ratio, d),
            },
        })
    return p


def vit_encode(params: Params, pixel_values: jax.Array,
               cfg: ViTConfig = DINO_VITS16) -> dict:
    """pixel_values [B,3,H,W] → {'cls': [B,D], 'tokens': [B,N,D]}."""
    b = pixel_values.shape[0]
    d = cfg.hidden_size
    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(jnp.float32),
        params["patch_embedding"]["w"].astype(jnp.float32),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    g = patches.shape[-1]
    x = patches.reshape(b, d, g * g).transpose(0, 2, 1)
    x = x + params["patch_embedding"]["b"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1]]

    h = cfg.num_heads
    hd = d // h
    for lp in params["layers"]:
        y = _ln(lp["ln1"], x, cfg.layer_norm_eps)
        qkv = jnp.einsum("bnd,de->bne", y, lp["attn"]["qkv"]["w"]) + lp["attn"]["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sp = lambda t: t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", sp(q), sp(k),
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), sp(v))
        att = att.transpose(0, 2, 1, 3).reshape(b, -1, d)
        x = x + (jnp.einsum("bnd,de->bne", att, lp["attn"]["proj"]["w"])
                 + lp["attn"]["proj"]["b"])
        y = _ln(lp["ln2"], x, cfg.layer_norm_eps)
        y = jnp.einsum("bnd,de->bne", y, lp["mlp"]["fc1"]["w"]) + lp["mlp"]["fc1"]["b"]
        y = jax.nn.gelu(y)
        y = jnp.einsum("bnd,de->bne", y, lp["mlp"]["fc2"]["w"]) + lp["mlp"]["fc2"]["b"]
        x = x + y
    x = _ln(params["final_ln"], x, cfg.layer_norm_eps)
    return {"cls": x[:, 0], "tokens": x[:, 1:]}


def convert_dino_state_dict(sd: Mapping[str, np.ndarray],
                            cfg: ViTConfig = DINO_VITS16) -> Params:
    """facebookresearch/dino ViT state dict → params."""

    def t(a):
        return jnp.asarray(np.asarray(a).T.copy())

    p: Params = {
        "cls_token": jnp.asarray(sd["cls_token"]),
        "patch_embedding": {
            "w": jnp.asarray(sd["patch_embed.proj.weight"]),
            "b": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "position_embedding": jnp.asarray(sd["pos_embed"])[0],
        "layers": [],
        "final_ln": {"scale": jnp.asarray(sd["norm.weight"]),
                     "bias": jnp.asarray(sd["norm.bias"])},
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        p["layers"].append({
            "ln1": {"scale": jnp.asarray(sd[f"{pre}.norm1.weight"]),
                    "bias": jnp.asarray(sd[f"{pre}.norm1.bias"])},
            "attn": {
                "qkv": {"w": t(sd[f"{pre}.attn.qkv.weight"]),
                        "b": jnp.asarray(sd[f"{pre}.attn.qkv.bias"])},
                "proj": {"w": t(sd[f"{pre}.attn.proj.weight"]),
                         "b": jnp.asarray(sd[f"{pre}.attn.proj.bias"])},
            },
            "ln2": {"scale": jnp.asarray(sd[f"{pre}.norm2.weight"]),
                    "bias": jnp.asarray(sd[f"{pre}.norm2.bias"])},
            "mlp": {
                "fc1": {"w": t(sd[f"{pre}.mlp.fc1.weight"]),
                        "b": jnp.asarray(sd[f"{pre}.mlp.fc1.bias"])},
                "fc2": {"w": t(sd[f"{pre}.mlp.fc2.weight"]),
                        "b": jnp.asarray(sd[f"{pre}.mlp.fc2.bias"])},
            },
        })
    return p
