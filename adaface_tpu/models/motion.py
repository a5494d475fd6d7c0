"""Temporal motion modules for video generation (AdaFace-Animate support).

The reference repo ships video *evaluation* (`scripts/eval_videos.py`) and
links the AdaFace-Animate demo (`app.py:307-308`) where ada tokens condition
an AnimateDiff-style video UNet.  This module provides the TPU-native
counterpart: plug-in temporal transformers ("motion modules") for our SD1.5
UNet so personalized text-to-video runs as one jitted XLA program.

Architecture follows the public AnimateDiff motion-module design so that
released `mm_sd_v15*.ckpt` motion weights can be converted
(`tools/convert_motion.py`):

- one `VanillaTemporalModule` after every (resnet, attention) pair of each
  down/up block, plus one in the mid block;
- each module: GroupNorm → proj_in → N × [2 × temporal self-attention +
  GEGLU feed-forward] → zero-initialized proj_out → residual;
- temporal attention runs over the frame axis with a sinusoidal positional
  encoding added to the normed input, so a module at init is an exact
  identity and the video UNet reproduces the image UNet frame-by-frame.

TPU mapping: the frame axis is tiny (8–32), so temporal attention is a
batched dense attention (batch = B·H·W spatial positions) that lowers to
large MXU matmuls; no flash kernel needed. The [BF, N, C] ⇄ [B·N, F, C]
relayouts are pure XLA transposes that fuse with the adjacent projections.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from adaface_tpu.ops.attention import multi_head_attention
from adaface_tpu.ops.fused_gn import fused_group_norm_silu

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MotionConfig:
    num_heads: int = 8
    num_layers: int = 1           # transformer blocks per module
    attns_per_block: int = 2      # ("Temporal_Self", "Temporal_Self")
    max_frames: int = 32          # positional-encoding table length (v2)
    norm_groups: int = 32
    norm_eps: float = 1e-6
    ff_mult: int = 4


MM_SD15_V2 = MotionConfig()


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _ln(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _dense(rng, cin, cout, std=None, zero=False):
    if zero:
        w = jnp.zeros((cin, cout), jnp.float32)
    else:
        std = std if std is not None else 1.0 / math.sqrt(cin)
        w = jax.random.normal(rng, (cin, cout), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _init_module(rng: jax.Array, c: int, mcfg: MotionConfig) -> Params:
    ks = iter(jax.random.split(rng, 4 + mcfg.num_layers * 16))
    blocks = []
    for _ in range(mcfg.num_layers):
        attns = []
        for _ in range(mcfg.attns_per_block):
            attns.append({
                "norm": _ln(c),
                "q": {"w": jax.random.normal(next(ks), (c, c)) / math.sqrt(c)},
                "k": {"w": jax.random.normal(next(ks), (c, c)) / math.sqrt(c)},
                "v": {"w": jax.random.normal(next(ks), (c, c)) / math.sqrt(c)},
                "o": _dense(next(ks), c, c),
            })
        blocks.append({
            "attn": attns,
            "norm_ff": _ln(c),
            "ff": {
                "proj_in": _dense(next(ks), c, c * mcfg.ff_mult * 2),  # GEGLU
                "proj_out": _dense(next(ks), c * mcfg.ff_mult, c),
            },
        })
    return {
        "norm": {"scale": jnp.ones((c,), jnp.float32),
                 "bias": jnp.zeros((c,), jnp.float32)},
        "proj_in": _dense(next(ks), c, c),
        "blocks": blocks,
        # zero-initialized: the module is an identity at init
        "proj_out": _dense(next(ks), c, c, zero=True),
    }


def init_motion_params(rng: jax.Array, unet_cfg,
                       mcfg: MotionConfig = MM_SD15_V2) -> Params:
    """Motion modules matching the SD1.5 UNet topology.

    Layout: {"down": [[m]*layers]*4, "mid": m, "up": [[m]*(layers+1)]*4}.
    """
    ch = unet_cfg.block_channels
    rev = list(reversed(ch))
    p: Params = {"down": [], "mid": None, "up": []}
    ki = 0

    def key():
        nonlocal ki
        ki += 1
        return jax.random.fold_in(rng, ki)

    for cout in ch:
        p["down"].append([
            _init_module(key(), cout, mcfg)
            for _ in range(unet_cfg.layers_per_block)
        ])
    p["mid"] = _init_module(key(), ch[-1], mcfg)
    for bi in range(len(ch)):
        p["up"].append([
            _init_module(key(), rev[bi], mcfg)
            for _ in range(unet_cfg.layers_per_block + 1)
        ])
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def sinusoidal_position_encoding(length: int, dim: int,
                                 dtype=jnp.float32) -> jax.Array:
    """Classic transformer PE table [length, dim] (interleaved sin/cos)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: (dim + 1) // 2]))
    return pe.astype(dtype)


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense_f(p, x):
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _temporal_attention(p: Params, x: jax.Array, pe: jax.Array,
                        num_heads: int) -> jax.Array:
    """Self-attention over the frame axis. x: [B', F, C]."""
    b, f, c = x.shape
    hd = c // num_heads
    h = x + pe[None, :f]
    q = _dense_f({"w": p["q"]["w"]}, h)
    k = _dense_f({"w": p["k"]["w"]}, h)
    v = _dense_f({"w": p["v"]["w"]}, h)

    def split(t):
        return t.reshape(b, f, num_heads, hd).transpose(0, 2, 1, 3)

    out = multi_head_attention(split(q), split(k), split(v),
                               scale=1.0 / math.sqrt(hd), use_flash=False)
    out = out.transpose(0, 2, 1, 3).reshape(b, f, c)
    return _dense_f(p["o"], out)


def motion_apply(p: Params, x: jax.Array, num_frames: int,
                 mcfg: MotionConfig = MM_SD15_V2) -> jax.Array:
    """Apply one temporal module to NHWC features [B·F, H, W, C]."""
    if num_frames <= 1:
        return x
    bf, hh, ww, c = x.shape
    b = bf // num_frames
    residual = x

    y = fused_group_norm_silu(x, p["norm"]["scale"], p["norm"]["bias"],
                              mcfg.norm_groups, mcfg.norm_eps,
                              apply_silu=False)
    y = _dense_f(p["proj_in"], y.reshape(bf, hh * ww, c))
    # [BF, N, C] → [B·N, F, C]: group frames of one video along the new axis
    n = hh * ww
    y = (y.reshape(b, num_frames, n, c)
          .transpose(0, 2, 1, 3)
          .reshape(b * n, num_frames, c))

    pe = sinusoidal_position_encoding(num_frames, c, y.dtype)
    for blk in p["blocks"]:
        for attn in blk["attn"]:
            y = y + _temporal_attention(attn, _layer_norm(attn["norm"], y),
                                        pe, mcfg.num_heads)
        ff_in = _layer_norm(blk["norm_ff"], y)
        proj = _dense_f(blk["ff"]["proj_in"], ff_in)
        val, gate = jnp.split(proj, 2, axis=-1)
        y = y + _dense_f(blk["ff"]["proj_out"], val * jax.nn.gelu(gate))

    y = _dense_f(p["proj_out"], y)
    y = (y.reshape(b, n, num_frames, c)
          .transpose(0, 2, 1, 3)
          .reshape(bf, hh, ww, c))
    return residual + y
