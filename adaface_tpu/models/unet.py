"""SD1.5 UNet (UNet2DConditionModel equivalent), pure-functional JAX/TPU.

TPU-first rebuild of the live denoiser path in the reference:
- `DiffusersUNetWrapper` (`ldm/models/diffusion/ddpm.py:4084-4252`) — the
  apply_model call convention (eps prediction on [B,4,64,64] latents with
  [B,S,768] text context).
- `AttnProcessor_LoRA_Capture` + `CrossAttnUpBlock2D_forward_capture`
  (`adaface/diffusers_attn_lora_capture.py:142-446`) — re-expressed as
  explicit dataflow: the forward takes an `AttnRuntime` config and returns
  `(eps, captured)` where `captured[layer][key]` holds q/q2/k/v/attn/
  attnscore/attn_out/outfeat for the last up block's 3 cross-attn layers
  (externally labeled 22/23/24, matching the reference's numbering,
  `diffusers_attn_lora_capture.py:632-659`).
- DoRA LoRA adapters on q/k/v/out of those layers (separate non-propagating
  q2; `q_lora_updates_query` switches whether q2 drives the real attention)
  and on the last up block's resnets[1,2].conv1/conv2 FFNs with named
  adapters (recon_loss / unet_distill / comp_distill,
  `set_up_ffn_loras:541-591`).
- Self-attention `img_mask` (keys outside the subject mask dropped,
  `:254-273`), cross-attn normalization (mean-subtracted subject-token
  scores × learnable scale factor with 10× grad, `:79-139`) and sc/mc
  attention-matrix mixing.

Layout: NHWC activations + HWIO conv kernels on-device (TPU-native); the
public interface stays NCHW to match latents produced by the VAE.
Compute in the caller-provided dtype (bf16 for speed), GroupNorm/LayerNorm
statistics in fp32.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any

import jax
import jax.numpy as jnp

from adaface_tpu.ops.attention import multi_head_attention
from adaface_tpu.ops.fused_gn import fused_group_norm_silu
from adaface_tpu.ops.fused_ln import fused_layer_norm
from adaface_tpu.ops.resize import resize_nearest, upsample2x_nearest
from adaface_tpu.utils.tensor import gen_gradient_scaler, gradient_scale

Params = dict[str, Any]

CAPTURE_LAYER_BASE = 22  # external label of the first captured CA layer


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attn_dim: int = 768
    num_heads: int = 8
    norm_groups: int = 32
    norm_eps: float = 1e-5
    transformer_norm_eps: float = 1e-6
    # which down/up blocks have cross-attention (SD1.5: last down block and
    # first up block are attention-free)
    down_has_attn: tuple = (True, True, True, False)
    up_has_attn: tuple = (False, True, True, True)
    time_embed_dim: int = 1280
    lora_rank: int = 192
    lora_alpha: int = 24  # rank / 8, `set_up_attn_processors` lora_scale_down=8
    # --- SDXL-family generality (SD1.5 defaults) ---
    # transformer blocks stacked per spatial-transformer, per down block
    # (up blocks mirror); entries for attention-free blocks are ignored
    transformer_depth: tuple = (1, 1, 1, 1)
    mid_transformer_depth: int = 1
    # per-down-block head counts (SDXL fixes head_dim=64 so heads vary per
    # level); None → `num_heads` everywhere
    block_num_heads: tuple | None = None
    # "text_time" addition embedding: pooled text emb + fourier(time_ids)
    # through a 2-layer MLP added to the time embedding. None → disabled.
    addition_time_embed_dim: int | None = None
    addition_pooled_dim: int = 1280
    addition_num_time_ids: int = 6


SD15_UNET = UNetConfig()

# SDXL-base UNet (inference family; the trained AdaFace path is SD1.5).
# Config mirrors stabilityai/stable-diffusion-xl-base-1.0's
# UNet2DConditionModel: 3 levels, transformer depth (1,2,10), head_dim 64,
# cross-attn 2048 (CLIP-L 768 ⊕ bigG 1280), text_time addition embedding.
SDXL_UNET = UNetConfig(
    block_channels=(320, 640, 1280),
    down_has_attn=(False, True, True),
    up_has_attn=(True, True, False),
    transformer_depth=(1, 2, 10),
    mid_transformer_depth=10,
    block_num_heads=(5, 10, 20),
    cross_attn_dim=2048,
    addition_time_embed_dim=256,
)


def _block_depth(cfg: UNetConfig, bi: int) -> int:
    td = cfg.transformer_depth
    return td[bi] if bi < len(td) else 1


def _block_heads(cfg: UNetConfig, bi: int) -> int:
    if cfg.block_num_heads is None:
        return cfg.num_heads
    return cfg.block_num_heads[bi]


@dataclasses.dataclass(frozen=True)
class AttnRuntime:
    """Per-call attention behavior flags (the reference's
    `set_lora_and_capture_flags`, `diffusers_attn_lora_capture.py:593-629`)."""

    capture: bool = False
    use_attn_lora: bool = False
    use_ffn_lora: bool = False
    ffn_adapter: str | None = None  # recon_loss | unet_distill | comp_distill
    q_lora_updates_query: bool = False
    normalize_cross_attn: bool = False
    mix_attn_mats_in_batch: bool = False
    res_hidden_gradscale: float = 1.0


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def conv2d(p: Params, x: jax.Array, stride: int = 1, padding=1) -> jax.Array:
    if "w_q" in p:  # int8 serving path (ops/quant.py), inference-only
        from adaface_tpu.ops.quant import int8_conv2d

        return int8_conv2d(p, x, stride, padding)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # NOTE: no preferred_element_type here — lax.conv's transpose rule can't
    # mix an f32 cotangent with bf16 operands (breaks jax.grad through a
    # bf16 UNet); the MXU still accumulates bf16 convs in f32 internally.
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + p["b"].astype(x.dtype))


def dense(p: Params, x: jax.Array) -> jax.Array:
    if "w_q" in p:  # int8 serving path (ops/quant.py), inference-only
        from adaface_tpu.ops.quant import int8_dense

        return int8_dense(p, x)
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def group_norm(p: Params, x: jax.Array, groups: int, eps: float,
               apply_silu: bool = False) -> jax.Array:
    """GroupNorm (optionally fused with SiLU) — single-pass Pallas kernel
    on TPU (ops/fused_gn), XLA elsewhere."""
    return fused_group_norm_silu(x, p["scale"], p["bias"], groups, eps,
                                 apply_silu=apply_silu)


def gn_silu(p: Params, x: jax.Array, groups: int, eps: float) -> jax.Array:
    return group_norm(p, x, groups, eps, apply_silu=True)


# A/B toggles for on-chip experiments (both measured via bench.py e2e)
_FUSED_LN = os.environ.get("ADAFACE_FUSED_LN", "0") == "1"
_FUSED_QKV = os.environ.get("ADAFACE_FUSED_QKV", "1") == "1"


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    if _FUSED_LN:
        return fused_layer_norm(x, p["scale"], p["bias"], eps)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0):
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (SD1.5 config): returns [B, dim] = [cos, sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _lora_delta(lp: Params, x: jax.Array, scale: float) -> jax.Array:
    """Plain LoRA branch: scale * (x @ A) @ B."""
    h = jnp.einsum("...i,ir->...r", x, lp["a"].astype(x.dtype))
    return scale * jnp.einsum("...r,ro->...o", h, lp["b"].astype(x.dtype))


def dora_dense(base: Params, lp: Params | None, x: jax.Array, scale: float):
    """DoRA linear: y = mag ⊙ x@(W+ΔW) / ||W+ΔW||_col  (peft semantics).

    lp None → plain base layer.
    """
    if lp is None:
        return dense(base, x)
    if "w_q" in base:
        # int8 base + active LoRA: compose on the dequantized kernel
        base = dict(base)
        base["w"] = base.pop("w_q").astype(jnp.float32) * base.pop("w_scale")
    w = base["w"].astype(jnp.float32) + scale * (
        lp["a"].astype(jnp.float32) @ lp["b"].astype(jnp.float32)
    )
    col_norm = jnp.linalg.norm(w, axis=0, keepdims=True)  # [1, out]
    w = w * (lp["mag"][None, :] / (col_norm + 1e-8))
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + base["b"]).astype(x.dtype)


def dora_conv(base: Params, lp: Params | None, x: jax.Array, scale: float,
              stride: int = 1, padding: int = 1):
    """DoRA 3x3 conv: per-out-channel magnitude over the (h,w,in) norm."""
    if lp is None:
        return conv2d(base, x, stride, padding)
    if "w_q" in base:
        # int8 base + active LoRA: compose on the dequantized kernel
        base = dict(base)
        base["w"] = base.pop("w_q").astype(jnp.float32) * base.pop("w_scale")
    kh, kw, cin, cout = base["w"].shape
    r = lp["a"].shape[-1]
    # ΔW = A (kh,kw,cin,r) composed with B (1,1,r,cout) → (kh,kw,cin,cout)
    delta = jnp.einsum("hwir,ro->hwio", lp["a"].astype(jnp.float32),
                       lp["b"][0, 0].astype(jnp.float32))
    w = base["w"].astype(jnp.float32) + scale * delta
    norm = jnp.sqrt((w**2).sum(axis=(0, 1, 2), keepdims=True))
    w = w * (lp["mag"][None, None, None, :] / (norm + 1e-8))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + base["b"].astype(x.dtype))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_conv(rng, kh, kw, cin, cout, std=None):
    if std is None:
        std = 1.0 / math.sqrt(kh * kw * cin)
    return {
        "w": jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _init_dense(rng, cin, cout, std=None):
    if std is None:
        std = 1.0 / math.sqrt(cin)
    return {
        "w": jax.random.normal(rng, (cin, cout), jnp.float32) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_resnet(rng, cin, cout, temb_dim):
    ks = jax.random.split(rng, 4)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout),
        "time_emb_proj": _init_dense(ks[1], temb_dim, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(ks[2], 3, 3, cout, cout),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv(ks[3], 1, 1, cin, cout)
    return p


def _init_attention(rng, q_dim, kv_dim):
    ks = jax.random.split(rng, 4)
    return {
        "q": {"w": jax.random.normal(ks[0], (q_dim, q_dim)) / math.sqrt(q_dim)},
        "k": {"w": jax.random.normal(ks[1], (kv_dim, q_dim)) / math.sqrt(kv_dim)},
        "v": {"w": jax.random.normal(ks[2], (kv_dim, q_dim)) / math.sqrt(kv_dim)},
        "o": _init_dense(ks[3], q_dim, q_dim),
    }


def _init_transformer_block(rng, dim, cross_dim):
    ks = jax.random.split(rng, 5)
    return {
        "norm1": _init_norm(dim),
        "attn1": _init_attention(ks[0], dim, dim),
        "norm2": _init_norm(dim),
        "attn2": _init_attention(ks[1], dim, cross_dim),
        "norm3": _init_norm(dim),
        "ff": {
            "proj_in": _init_dense(ks[2], dim, dim * 8),  # GEGLU: 2*4*dim
            "proj_out": _init_dense(ks[3], dim * 4, dim),
        },
    }


def _init_transformer2d(rng, c, cross_dim, depth: int = 1):
    ks = jax.random.split(rng, 3 + depth)
    p = {
        "norm": _init_norm(c),
        "proj_in": _init_conv(ks[0], 1, 1, c, c),
        "proj_out": _init_conv(ks[1], 1, 1, c, c),
    }
    if depth == 1:  # SD1.5 layout (converters/checkpoints use "block")
        p["block"] = _init_transformer_block(ks[2], c, cross_dim)
    else:
        p["blocks"] = [
            _init_transformer_block(ks[2 + i], c, cross_dim)
            for i in range(depth)
        ]
    return p


def init_unet_params(rng: jax.Array, cfg: UNetConfig = SD15_UNET) -> Params:
    ks = iter(jax.random.split(rng, 128))
    ch = cfg.block_channels
    temb = cfg.time_embed_dim
    p: Params = {
        "conv_in": _init_conv(next(ks), 3, 3, cfg.in_channels, ch[0]),
        "time_mlp": {
            "fc1": _init_dense(next(ks), ch[0], temb),
            "fc2": _init_dense(next(ks), temb, temb),
        },
        "down_blocks": [],
        "mid": {},
        "up_blocks": [],
        "conv_norm_out": _init_norm(ch[0]),
        "conv_out": _init_conv(next(ks), 3, 3, ch[0], cfg.out_channels, std=1e-4),
    }
    # down blocks
    cin = ch[0]
    for bi, cout in enumerate(ch):
        blk = {"resnets": [], "attentions": []}
        for li in range(cfg.layers_per_block):
            blk["resnets"].append(_init_resnet(next(ks), cin if li == 0 else cout, cout, temb))
            if cfg.down_has_attn[bi]:
                blk["attentions"].append(
                    _init_transformer2d(next(ks), cout, cfg.cross_attn_dim,
                                        _block_depth(cfg, bi))
                )
        if bi < len(ch) - 1:
            blk["downsample"] = _init_conv(next(ks), 3, 3, cout, cout)
        p["down_blocks"].append(blk)
        cin = cout
    # mid
    p["mid"] = {
        "resnet1": _init_resnet(next(ks), ch[-1], ch[-1], temb),
        "attention": _init_transformer2d(next(ks), ch[-1], cfg.cross_attn_dim,
                                         cfg.mid_transformer_depth),
        "resnet2": _init_resnet(next(ks), ch[-1], ch[-1], temb),
    }
    if cfg.addition_time_embed_dim is not None:
        add_in = (cfg.addition_pooled_dim
                  + cfg.addition_num_time_ids * cfg.addition_time_embed_dim)
        p["add_embedding"] = {
            "fc1": _init_dense(next(ks), add_in, temb),
            "fc2": _init_dense(next(ks), temb, temb),
        }
    # up blocks (reversed channels)
    rev = list(reversed(ch))  # [1280, 1280, 640, 320]
    for bi in range(len(ch)):
        cout = rev[bi]
        prev_out = rev[max(bi - 1, 0)]
        blk = {"resnets": [], "attentions": []}
        for li in range(cfg.layers_per_block + 1):
            # skip channels follow the down path in reverse
            skip_ch = rev[min(bi + 1, len(ch) - 1)] if li == cfg.layers_per_block else cout
            res_in = (prev_out if li == 0 else cout) + skip_ch
            blk["resnets"].append(_init_resnet(next(ks), res_in, cout, temb))
            if cfg.up_has_attn[bi]:
                blk["attentions"].append(
                    _init_transformer2d(next(ks), cout, cfg.cross_attn_dim,
                                        _block_depth(cfg, len(ch) - 1 - bi))
                )
        if bi < len(ch) - 1:
            blk["upsample"] = _init_conv(next(ks), 3, 3, cout, cout)
        p["up_blocks"].append(blk)
    return p


def init_attn_lora_params(rng: jax.Array, cfg: UNetConfig = SD15_UNET) -> Params:
    """LoRA/DoRA params for the 3 captured CA layers + cross_attn_scale_factor.

    B matrices start at zero (reference: 'LoRA up is initialized to 0').
    Layout: {'22': {'q': {a,b,mag}, 'k':…, 'v':…, 'out':…, 'scale_factor'}, …}
    """
    c = cfg.block_channels[0]  # 320: last up block channels
    r = cfg.lora_rank
    out = {}
    for li in range(3):
        ks = iter(jax.random.split(jax.random.fold_in(rng, li), 8))
        layer = {}
        for name, cin in (("q", c), ("k", cfg.cross_attn_dim), ("v", cfg.cross_attn_dim), ("out", c)):
            layer[name] = {
                "a": jax.random.normal(next(ks), (cin, r), jnp.float32) / math.sqrt(cin),
                "b": jnp.zeros((r, c), jnp.float32),
                "mag": jnp.ones((c,), jnp.float32),
            }
        layer["scale_factor"] = jnp.asarray(0.8, jnp.float32)
        out[str(CAPTURE_LAYER_BASE + li)] = layer
    return out


def init_ffn_lora_params(
    rng: jax.Array,
    cfg: UNetConfig = SD15_UNET,
    adapters=("recon_loss", "unet_distill", "comp_distill"),
    lora_rank: int = 192,
) -> Params:
    """DoRA params for up_blocks[-1].resnets[1,2].conv1/conv2 × 3 adapters
    (`set_up_ffn_loras`, `diffusers_attn_lora_capture.py:541-591`)."""
    c = cfg.block_channels[0]
    out = {}
    for ai, ad in enumerate(adapters):
        ad_p = {}
        for ri in (1, 2):
            ks = iter(jax.random.split(jax.random.fold_in(rng, ai * 10 + ri), 4))
            # resnets[1,2] of the last up block: conv1 consumes the
            # [h; skip] concat (2c channels), conv2 consumes c
            conv_in = {"conv1": 2 * c, "conv2": c}
            ad_p[str(ri)] = {
                conv: {
                    "a": jax.random.normal(
                        next(ks), (3, 3, conv_in[conv], lora_rank), jnp.float32
                    )
                    / math.sqrt(9 * conv_in[conv]),
                    "b": jnp.zeros((1, 1, lora_rank, c), jnp.float32),
                    "mag": jnp.ones((c,), jnp.float32),
                }
                for conv in ("conv1", "conv2")
            }
        out[ad] = ad_p
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _resnet(p, x, temb, cfg: UNetConfig, ffn_lora=None, lora_scale=0.125,
            lora_gate=None):
    def ffn_conv(name, h):
        lp = None if ffn_lora is None else ffn_lora.get(name)
        y = dora_conv(p[name], lp, h, lora_scale)
        if lp is not None and lora_gate is not None:
            # per-example LoRA gate: the reference enables the comp ffn
            # LoRA on 50% of guided_denoise calls and never on the mc
            # block (`ddpm.py:1640,1703-1706`)
            y = jnp.where(lora_gate[:, None, None, None] > 0, y,
                          conv2d(p[name], h))
        return y

    h = gn_silu(p["norm1"], x, cfg.norm_groups, cfg.norm_eps)
    h = ffn_conv("conv1", h)
    h = h + dense(p["time_emb_proj"], jax.nn.silu(temb))[:, None, None, :]
    h = gn_silu(p["norm2"], h, cfg.norm_groups, cfg.norm_eps)
    h = ffn_conv("conv2", h)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _cross_attention(
    p: Params,
    x: jax.Array,  # [B, N, C]
    context: jax.Array | None,
    num_heads: int,
    rt: AttnRuntime,
    kv_mask: jax.Array | None,
    lora: Params | None,
    subj_mask: jax.Array | None,
    lora_scale: float,
    want_capture: bool,
    lora_gate: jax.Array | None = None,  # [B] 1=LoRA, 0=plain (per example)
):
    """Returns (out, captured|None). context None → self-attention.

    `lora_gate` blends the LoRA'd projections with the plain ones per
    batch row — the batched equivalent of the reference's per-block sliced
    UNet calls with different use_attn_lora flags (`guided_denoise`,
    `ddpm.py:1630-1712`: attn LoRA on ss/sc/sr, never on mc)."""
    b, n, c = x.shape
    hd = c // num_heads
    is_cross = context is not None
    ctx = context if is_cross else x

    use_lora = rt.use_attn_lora and lora is not None and is_cross

    if not is_cross and _FUSED_QKV:
        # fused QKV: one matmul reads x once instead of three times —
        # the projections are HBM-bound at 4096 image tokens
        wqkv = jnp.concatenate(
            [p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=1).astype(x.dtype)
        q, k, v = jnp.split(jnp.einsum("bnc,cd->bnd", x, wqkv), 3, axis=-1)
        q2 = q
    elif not is_cross:
        q = jnp.einsum("bnc,cd->bnd", x, p["q"]["w"].astype(x.dtype))
        k = jnp.einsum("bnc,cd->bnd", x, p["k"]["w"].astype(x.dtype))
        v = jnp.einsum("bnc,cd->bnd", x, p["v"]["w"].astype(x.dtype))
        q2 = q
    else:
        q = jnp.einsum("bnc,cd->bnd", x, p["q"]["w"].astype(x.dtype))
        if use_lora and "q" in lora:
            q2 = dora_dense({"w": p["q"]["w"], "b": jnp.zeros((c,), x.dtype)},
                            lora["q"], x, lora_scale)
            if lora_gate is not None:
                q2 = jnp.where(lora_gate[:, None, None] > 0, q2, q)
            if rt.q_lora_updates_query:
                q = q2
        else:
            q2 = q
        # k/v LoRAs exist in the param set but are disabled in the live
        # reference path ("currently k, v loras are never enabled",
        # `diffusers_attn_lora_capture.py:240-243`); fused KV over context
        wkv = jnp.concatenate(
            [p["k"]["w"], p["v"]["w"]], axis=1).astype(x.dtype)
        k, v = jnp.split(jnp.einsum("bnc,cd->bnd", ctx, wkv), 2, axis=-1)

    def split(t):
        return t.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)

    qh, q2h, kh, vh = split(q), split(q2), split(k), split(v)
    scale = 1.0 / math.sqrt(hd)

    captured = None
    slow_path = is_cross and (want_capture or rt.normalize_cross_attn
                              or rt.mix_attn_mats_in_batch)
    if slow_path:
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, -1e9)
        if rt.mix_attn_mats_in_batch:
            # batch halves are [sc, mc]; both get the sc-grad-only average
            # (`diffusers_attn_lora_capture.py:104-115`)
            sc, mc = jnp.split(logits, 2, axis=0)
            mixed = (sc + jax.lax.stop_gradient(mc)) / 2.0
            logits = jnp.concatenate([mixed, mixed], axis=0)
        elif rt.normalize_cross_attn and subj_mask is not None:
            mean_q = jax.lax.stop_gradient(logits.mean(axis=2, keepdims=True))
            factor = gradient_scale(lora["scale_factor"], 10.0) if (
                lora is not None and "scale_factor" in lora) else 1.0
            normed = (logits - mean_q) * factor
            logits = jnp.where(subj_mask[:, None, None, :] > 0, normed, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        out_h = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        if want_capture:
            rscale = math.sqrt(scale)
            captured = {
                # [B, H*D, N] layouts match the reference cache
                # (`diffusers_attn_lora_capture.py:344-362`); attn/score
                # stored in the compute dtype — the reference captures
                # inside the fp16 autocast region (`ddpm.py:4225`), and
                # a step keeps S×3 layers of [B,H,N,Sk] probs live, so
                # f32 copies alone blow the 16 GB HBM envelope at bs≥2
                "q": (qh * rscale).transpose(0, 1, 3, 2).reshape(b, c, -1),
                "q2": (q2h * rscale).transpose(0, 1, 3, 2).reshape(b, c, -1),
                "k": (kh * rscale).transpose(0, 1, 3, 2).reshape(b, c, -1),
                "v": (vh * rscale).transpose(0, 1, 3, 2).reshape(b, c, -1),
                "attn": probs.astype(x.dtype),
                "attnscore": logits.astype(x.dtype),
            }
    else:
        out_h = multi_head_attention(qh, kh, vh, kv_mask=kv_mask, scale=scale)

    out = out_h.transpose(0, 2, 1, 3).reshape(b, n, c)
    if use_lora and "out" in lora:
        out_l = dora_dense(p["o"], lora["out"], out, lora_scale)
        if lora_gate is not None:
            out = jnp.where(lora_gate[:, None, None] > 0, out_l,
                            dense(p["o"], out))
        else:
            out = out_l
    else:
        out = dense(p["o"], out)
    if captured is not None:
        captured["attn_out"] = out.transpose(0, 2, 1)
    return out, captured


def _transformer2d(
    p, x, context, cfg: UNetConfig, rt: AttnRuntime, kv_mask, img_mask_flat,
    lora, subj_mask, want_capture, lora_gate=None, tome=None, num_heads=None,
):
    b, h, w, c = x.shape
    if num_heads is None:
        num_heads = cfg.num_heads
    residual = x
    y = group_norm(p["norm"], x, cfg.norm_groups, cfg.transformer_norm_eps)
    y = conv2d(p["proj_in"], y, padding=0)
    y = y.reshape(b, h * w, c)

    # ToMe (ops/tome.py): merge redundant spatial tokens around each op,
    # ToMe-SD style (merge recomputed from this block's input tokens).
    # Disabled under img_mask (key-validity would need per-merged-token
    # bookkeeping) and for the capture/attn-augmentation slow paths whose
    # tensors must stay at full resolution.
    merge = unmerge = lambda t: t
    tome_on = (
        tome is not None and tome.ratio > 0.0 and h * w >= tome.min_tokens
        and img_mask_flat is None)
    if tome_on:
        from adaface_tpu.ops.tome import build_merge

        merge, unmerge, _ = build_merge(
            y, h, w, int(h * w * tome.ratio), tome.sx, tome.sy,
            tome.rand_seed)

    lora_scale = cfg.lora_alpha / cfg.lora_rank
    captured = None
    # depth>1 (SDXL levels): transformer blocks stack inside one
    # proj_in/proj_out pair; capture/LoRA semantics (an SD1.5-path feature)
    # apply to the last inner block
    blocks = p["blocks"] if "blocks" in p else [p["block"]]
    for bidx, bp in enumerate(blocks):
        is_last_inner = bidx == len(blocks) - 1
        # self-attention (img_mask drops masked keys, `:254-273`)
        a1, _ = _cross_attention(
            bp["attn1"], merge(layer_norm(bp["norm1"], y)), None, num_heads,
            rt, img_mask_flat, None, None, lora_scale, want_capture=False,
        )
        y = y + unmerge(a1)
        merge_ca = (tome_on and tome.merge_crossattn and not want_capture
                    and not rt.normalize_cross_attn
                    and not rt.mix_attn_mats_in_batch)
        ca_in = layer_norm(bp["norm2"], y)
        a2, cap = _cross_attention(
            bp["attn2"], merge(ca_in) if merge_ca else ca_in, context,
            num_heads,
            rt, kv_mask, lora if is_last_inner else None, subj_mask,
            lora_scale, want_capture=want_capture and is_last_inner,
            lora_gate=lora_gate,
        )
        if is_last_inner:
            captured = cap
        y = y + (unmerge(a2) if merge_ca else a2)
        # GEGLU feed-forward
        ff_in = layer_norm(bp["norm3"], y)
        if tome_on and tome.merge_mlp:
            ff_in = merge(ff_in)
        proj = dense(bp["ff"]["proj_in"], ff_in)
        val, gate = jnp.split(proj, 2, axis=-1)
        ff_out = dense(bp["ff"]["proj_out"], val * jax.nn.gelu(gate))
        y = y + (unmerge(ff_out) if (tome_on and tome.merge_mlp) else ff_out)

    y = y.reshape(b, h, w, c)
    y = conv2d(p["proj_out"], y, padding=0)
    return y + residual, captured


def _resize_img_mask(img_mask: jax.Array | None, h: int, w: int):
    """[B,1,H0,W0] → flat [B, h*w] key mask; None if empty."""
    if img_mask is None:
        return None
    m = resize_nearest(img_mask.astype(jnp.float32), (h, w))
    return m.reshape(m.shape[0], h * w)


def unet_apply(
    params: Params,
    x: jax.Array,  # [B, 4, 64, 64] (NCHW at the interface)
    t: jax.Array,  # [B] int32
    context: jax.Array,  # [B, S, 768]
    cfg: UNetConfig = SD15_UNET,
    rt: AttnRuntime = AttnRuntime(),
    kv_mask: jax.Array | None = None,  # [B, S] text key mask
    img_mask: jax.Array | None = None,  # [B, 1, H, W] self-attn subject mask
    attn_lora: Params | None = None,
    ffn_lora: Params | None = None,
    subj_mask: jax.Array | None = None,  # [B, S] subject-token positions
    motion: Params | None = None,  # temporal modules (models/motion.py)
    num_frames: int = 1,  # frames per video when motion is given; B = V·F
    motion_cfg=None,  # MotionConfig override (defaults to MM_SD15_V2)
    deepcache: str | tuple | None = None,  # None | "collect" | ("shallow", feat)
    attn_lora_gate: jax.Array | None = None,  # [B] per-example attn-LoRA gate
    ffn_lora_gate: jax.Array | None = None,  # [B] per-example ffn-LoRA gate
    tome=None,  # ToMeConfig (ops/tome.py) token-merging acceleration
    added_cond: dict | None = None,  # SDXL: {text_embeds [B,1280], time_ids [B,6]}
):
    """Returns (eps [B,4,64,64], captured dict).

    captured = {'outfeat': {22: [B,C,h,w],…}, 'q': {22: …}, …} for the last
    up block's 3 CA layers when rt.capture.

    With `motion` params the batch is interpreted as V videos × num_frames
    contiguous frames and an AnimateDiff-style temporal module runs after
    every (resnet, attention) pair (AdaFace-Animate video path).

    DeepCache-style serving acceleration (Faster Diffusion /
    DeepCache; timestep-adjacent encoder features are near-identical):
    deepcache="collect" additionally returns the feature entering the
    LAST up block, as a third output; deepcache=("shallow", feat)
    recomputes only conv_in + down block 0 + the last up block + head,
    substituting `feat` for the deep trunk. The shallow pass still
    recomputes the captured CA layers 22-24 (they live in the last up
    block), so activation capture stays exact.
    """
    dtype = context.dtype
    x = x.astype(dtype).transpose(0, 2, 3, 1)  # NHWC

    dc_mode, dc_feat = None, None
    if deepcache is not None:
        assert motion is None, "deepcache is not supported on the video path"
        if deepcache == "collect":
            dc_mode = "collect"
        else:
            dc_mode, dc_feat = deepcache

    if motion is not None and num_frames > 1:
        from adaface_tpu.models.motion import MM_SD15_V2, motion_apply

        mcfg = motion_cfg if motion_cfg is not None else MM_SD15_V2

        def temporal(mm, h):
            return motion_apply(mm, h, num_frames, mcfg)
    else:
        def temporal(mm, h):
            return h

    temb = timestep_embedding(t, cfg.block_channels[0]).astype(dtype)
    temb = dense(params["time_mlp"]["fc2"],
                 jax.nn.silu(dense(params["time_mlp"]["fc1"], temb)))
    if cfg.addition_time_embed_dim is not None:
        # SDXL "text_time" conditioning: per-scalar fourier embedding of the
        # 6 size/crop time_ids ⊕ the bigG pooled text embedding, through a
        # 2-layer MLP, added to the time embedding
        tids = added_cond["time_ids"]  # [B, 6]
        four = timestep_embedding(
            tids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(tids.shape[0], -1)
        add_in = jnp.concatenate(
            [added_cond["text_embeds"].astype(jnp.float32), four], axis=-1
        ).astype(dtype)
        aug = dense(params["add_embedding"]["fc2"],
                    jax.nn.silu(dense(params["add_embedding"]["fc1"], add_in)))
        temb = temb + aug

    ffn_ad = None
    if rt.use_ffn_lora and ffn_lora is not None and rt.ffn_adapter is not None:
        ffn_ad = ffn_lora[rt.ffn_adapter]
    lora_scale = cfg.lora_alpha / cfg.lora_rank

    h = conv2d(params["conv_in"], x)
    skips = [h]
    for bi, blk in enumerate(params["down_blocks"]):
        if dc_mode == "shallow" and bi > 0:
            break
        im = _resize_img_mask(img_mask, h.shape[1], h.shape[2])
        for li, res in enumerate(blk["resnets"]):
            h = _resnet(res, h, temb, cfg)
            if cfg.down_has_attn[bi]:
                h, _ = _transformer2d(
                    blk["attentions"][li], h, context, cfg, rt, kv_mask, im,
                    None, subj_mask, want_capture=False, tome=tome,
                    num_heads=_block_heads(cfg, bi))
            if motion is not None:
                h = temporal(motion["down"][bi][li], h)
            skips.append(h)
        if "downsample" in blk and dc_mode != "shallow":
            h = conv2d(blk["downsample"], h, stride=2)
            skips.append(h)

    if dc_mode != "shallow":
        im = _resize_img_mask(img_mask, h.shape[1], h.shape[2])
        h = _resnet(params["mid"]["resnet1"], h, temb, cfg)
        h, _ = _transformer2d(params["mid"]["attention"], h, context, cfg,
                              rt, kv_mask, im, None, subj_mask,
                              want_capture=False, tome=tome,
                              num_heads=_block_heads(cfg, len(cfg.block_channels) - 1))
        if motion is not None:
            h = temporal(motion["mid"], h)
        h = _resnet(params["mid"]["resnet2"], h, temb, cfg)

    captured: dict[str, dict[int, jax.Array]] = {}
    dc_out = None
    n_up = len(params["up_blocks"])
    for bi, blk in enumerate(params["up_blocks"]):
        is_last = bi == n_up - 1
        if dc_mode == "shallow":
            if not is_last:
                continue
            h = dc_feat.astype(dtype)
        elif dc_mode == "collect" and is_last:
            dc_out = h
        im = _resize_img_mask(img_mask, h.shape[1], h.shape[2])
        for li, res in enumerate(blk["resnets"]):
            skip = skips.pop()
            # reference scales grads of residual skip features for
            # up_blocks[1:] (`diffusers_attn_lora_capture.py:601-629`)
            if bi >= 1 and rt.res_hidden_gradscale != 1.0:
                skip = gen_gradient_scaler(rt.res_hidden_gradscale)(skip)
            ffn_lora_res = None
            if is_last and ffn_ad is not None and str(li) in ffn_ad:
                ffn_lora_res = ffn_ad[str(li)]
            h = _resnet(res, jnp.concatenate([h, skip], axis=-1), temb, cfg,
                        ffn_lora=ffn_lora_res, lora_scale=lora_scale,
                        lora_gate=ffn_lora_gate)
            if cfg.up_has_attn[bi]:
                want_cap = is_last and rt.capture
                layer_lora = None
                if is_last and attn_lora is not None:
                    layer_lora = attn_lora.get(str(CAPTURE_LAYER_BASE + li))
                h, cap = _transformer2d(
                    blk["attentions"][li], h, context, cfg, rt, kv_mask, im,
                    layer_lora, subj_mask, want_capture=want_cap,
                    lora_gate=attn_lora_gate, tome=tome,
                    num_heads=_block_heads(cfg, n_up - 1 - bi))
                if want_cap:
                    label = CAPTURE_LAYER_BASE + li
                    for k, val in (cap or {}).items():
                        captured.setdefault(k, {})[label] = val
                    captured.setdefault("outfeat", {})[label] = (
                        h.transpose(0, 3, 1, 2))
            if motion is not None:
                h = temporal(motion["up"][bi][li], h)
        if "upsample" in blk:
            h = conv2d(blk["upsample"], upsample2x_nearest(h))

    h = gn_silu(params["conv_norm_out"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(params["conv_out"], h)
    eps = h.transpose(0, 3, 1, 2)
    if dc_mode == "collect":
        return eps, captured, dc_out
    return eps, captured
