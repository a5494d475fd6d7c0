"""MMDiT (Stable Diffusion 3 transformer), pure-functional JAX/TPU.

Backs the reference AdaFaceWrapper's "text2img3" branch
(`adaface/adaface_wrapper.py:128,601-607`), which delegates to the
diffusers `StableDiffusion3Pipeline`; here the denoiser is native. The
architecture follows the published SD3 spec (Esser et al., "Scaling
Rectified Flow Transformers", 2024) in the diffusers `SD3Transformer2DModel`
weight layout so real checkpoints convert directly
(`tools/convert_mmdit.py`):

- 2×2 patchify of the 16-channel latent, 2-D sin/cos position embedding
  computed at `pos_embed_max_size` and center-cropped to the latent grid;
- conditioning embedding = MLP(fourier(t)) + MLP(pooled text [2048]);
- joint transformer blocks: separate latent/context streams, each
  AdaLN-zero modulated (6 chunks), attending jointly over the
  concatenated [latent ‖ context] sequence; the final block is
  context_pre_only (context contributes keys/values but has no output
  projection);
- AdaLN-continuous final norm + linear head, unpatchified to a velocity
  prediction for rectified-flow sampling (`ops/samplers.py
  rectified_flow_sample`).

TPU notes: everything is batched matmuls on the MXU (head_dim 64 fills
the lanes, unlike SD-UNet's 40); sequences are static (4096 latent + 333
context tokens at 1024²), so one jitted graph serves the whole loop.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    depth: int = 24
    hidden: int = 1536
    num_heads: int = 24
    context_dim: int = 4096  # joint_attention_dim (padded CLIP ‖ T5)
    pooled_dim: int = 2048  # CLIP-L(768) ‖ bigG(1280) projected poolings
    pos_embed_max_size: int = 192
    time_embed_dim: int = 256  # fourier width before the MLP
    mlp_ratio: float = 4.0
    qk_norm: bool = False  # SD3-medium: off; SD3.5 uses RMS qk-norm


# sd3-medium (2B) geometry
SD3_MEDIUM = MMDiTConfig()


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _lin(rng, d_in, d_out, std=0.02):
    return {"w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * std,
            "b": jnp.zeros((d_out,), jnp.float32)}


def _ln():
    return {}  # elementwise_affine=False LayerNorms carry no params


def _init_block(rng, cfg: MMDiTConfig, pre_only: bool):
    h = cfg.hidden
    mlp = int(h * cfg.mlp_ratio)
    ks = iter(jax.random.split(rng, 24))
    blk = {
        # latent stream
        "ada_x": _lin(next(ks), h, 6 * h, std=0.0),  # AdaLN-zero starts at 0
        "attn": {
            "q": _lin(next(ks), h, h), "k": _lin(next(ks), h, h),
            "v": _lin(next(ks), h, h), "o": _lin(next(ks), h, h),
        },
        "mlp_x": {"fc1": _lin(next(ks), h, mlp), "fc2": _lin(next(ks), mlp, h)},
        # context stream
        "attn_ctx": {
            "q": _lin(next(ks), h, h), "k": _lin(next(ks), h, h),
            "v": _lin(next(ks), h, h),
        },
    }
    if cfg.qk_norm:
        blk["attn"]["q_rms"] = jnp.ones((h // cfg.num_heads,), jnp.float32)
        blk["attn"]["k_rms"] = jnp.ones((h // cfg.num_heads,), jnp.float32)
        blk["attn_ctx"]["q_rms"] = jnp.ones((h // cfg.num_heads,), jnp.float32)
        blk["attn_ctx"]["k_rms"] = jnp.ones((h // cfg.num_heads,), jnp.float32)
    if pre_only:
        blk["ada_ctx"] = _lin(next(ks), h, 2 * h, std=0.0)
    else:
        blk["ada_ctx"] = _lin(next(ks), h, 6 * h, std=0.0)
        blk["attn_ctx"]["o"] = _lin(next(ks), h, h)
        blk["mlp_ctx"] = {"fc1": _lin(next(ks), h, mlp),
                          "fc2": _lin(next(ks), mlp, h)}
    return blk


def init_mmdit_params(rng: jax.Array, cfg: MMDiTConfig = SD3_MEDIUM) -> Params:
    h = cfg.hidden
    p = cfg.patch_size
    ks = iter(jax.random.split(rng, cfg.depth + 8))
    return {
        "patch_embed": {
            "w": jax.random.normal(
                next(ks), (p, p, cfg.in_channels, h), jnp.float32) * 0.02,
            "b": jnp.zeros((h,), jnp.float32),
        },
        "time_mlp": {"fc1": _lin(next(ks), cfg.time_embed_dim, h),
                     "fc2": _lin(next(ks), h, h)},
        "pooled_mlp": {"fc1": _lin(next(ks), cfg.pooled_dim, h),
                       "fc2": _lin(next(ks), h, h)},
        "context_embedder": _lin(next(ks), cfg.context_dim, h),
        "blocks": [
            _init_block(next(ks), cfg, pre_only=(i == cfg.depth - 1))
            for i in range(cfg.depth)
        ],
        "ada_out": _lin(next(ks), h, 2 * h, std=0.0),
        "proj_out": _lin(next(ks), h, p * p * cfg.out_channels, std=0.0),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _dense(p, x):
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def _layer_norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


def timestep_fourier(t: jax.Array, dim: int, max_period: float = 10000.0):
    """[cos, sin] fourier features (diffusers Timesteps flip_sin_to_cos)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def sincos_pos_embed_2d(dim: int, grid: int) -> np.ndarray:
    """Standard 2-D sin/cos position table [grid*grid, dim] (ViT/MAE
    convention: dim/2 per axis, [sin, cos] per frequency)."""
    def one_axis(pos):
        d = dim // 2
        omega = 1.0 / (10000.0 ** (np.arange(d // 2, dtype=np.float64)
                                   / (d / 2.0)))
        out = np.einsum("p,f->pf", pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords = np.arange(grid, dtype=np.float64)
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    emb = np.concatenate([one_axis(gy.reshape(-1)), one_axis(gx.reshape(-1))],
                         axis=1)
    return emb.astype(np.float32)  # [grid², dim]


def _cropped_pos_embed(cfg: MMDiTConfig, gh: int, gw: int) -> jnp.ndarray:
    """Center-crop the max-size table to the gh×gw latent grid
    (diffusers PatchEmbed.cropped_pos_embed)."""
    m = cfg.pos_embed_max_size
    table = sincos_pos_embed_2d(cfg.hidden, m).reshape(m, m, cfg.hidden)
    top = (m - gh) // 2
    left = (m - gw) // 2
    return jnp.asarray(
        table[top:top + gh, left:left + gw].reshape(gh * gw, cfg.hidden))


def _rms(x, scale, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (n * scale).astype(x.dtype)


def _joint_attention(blk, x, ctx, cfg: MMDiTConfig, pre_only: bool):
    """Joint attention over [latent ‖ context]; returns per-stream outs."""
    b, n, h = x.shape
    nh = cfg.num_heads
    hd = h // nh

    def heads(t):
        return t.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

    qx = heads(_dense(blk["attn"]["q"], x))
    kx = heads(_dense(blk["attn"]["k"], x))
    vx = heads(_dense(blk["attn"]["v"], x))
    qc = heads(_dense(blk["attn_ctx"]["q"], ctx))
    kc = heads(_dense(blk["attn_ctx"]["k"], ctx))
    vc = heads(_dense(blk["attn_ctx"]["v"], ctx))
    if cfg.qk_norm:
        qx, kx = _rms(qx, blk["attn"]["q_rms"]), _rms(kx, blk["attn"]["k_rms"])
        qc = _rms(qc, blk["attn_ctx"]["q_rms"])
        kc = _rms(kc, blk["attn_ctx"]["k_rms"])

    q = jnp.concatenate([qx, qc], axis=2)  # latent first (diffusers order)
    k = jnp.concatenate([kx, kc], axis=2)
    v = jnp.concatenate([vx, vc], axis=2)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, -1, h)
    out_x, out_c = out[:, :n], out[:, n:]
    out_x = _dense(blk["attn"]["o"], out_x)
    if not pre_only:
        out_c = _dense(blk["attn_ctx"]["o"], out_c)
    return out_x, out_c


def _block(blk, x, ctx, emb, cfg: MMDiTConfig, pre_only: bool):
    silu_emb = jax.nn.silu(emb)
    mx = _dense(blk["ada_x"], silu_emb)
    sx, cx, gx, sm, cm, gm = jnp.split(mx, 6, axis=-1)
    if pre_only:
        mc = _dense(blk["ada_ctx"], silu_emb)
        # diffusers AdaLayerNormZero (pre-only) order: [scale, shift]
        c_scale, c_shift = jnp.split(mc, 2, axis=-1)
        ctx_in = _modulate(_layer_norm(ctx), c_shift, c_scale)
    else:
        mc = _dense(blk["ada_ctx"], silu_emb)
        cs, cc, cg, csm, ccm, cgm = jnp.split(mc, 6, axis=-1)
        ctx_in = _modulate(_layer_norm(ctx), cs, cc)

    x_in = _modulate(_layer_norm(x), sx, cx)
    ax, ac = _joint_attention(blk, x_in, ctx_in, cfg, pre_only)
    x = x + gx[:, None] * ax
    h = _modulate(_layer_norm(x), sm, cm)
    h = _dense(blk["mlp_x"]["fc2"],
               jax.nn.gelu(_dense(blk["mlp_x"]["fc1"], h),
                           approximate=True))
    x = x + gm[:, None] * h

    if pre_only:
        return x, ctx
    ctx = ctx + cg[:, None] * ac
    hc = _modulate(_layer_norm(ctx), csm, ccm)
    hc = _dense(blk["mlp_ctx"]["fc2"],
                jax.nn.gelu(_dense(blk["mlp_ctx"]["fc1"], hc),
                            approximate=True))
    ctx = ctx + cgm[:, None] * hc
    return x, ctx


def mmdit_apply(
    params: Params,
    x: jax.Array,  # [B, C, H, W] latent (NCHW interface, like the UNet)
    t: jax.Array,  # [B] float timesteps (sigma·1000 convention)
    context: jax.Array,  # [B, S, context_dim]
    pooled: jax.Array,  # [B, pooled_dim]
    cfg: MMDiTConfig = SD3_MEDIUM,
) -> jax.Array:
    """→ velocity prediction [B, C, H, W]."""
    dtype = context.dtype
    b, c, hh, ww = x.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p

    # patchify: [B, gh*gw, hidden]
    xi = x.astype(dtype).transpose(0, 2, 3, 1)  # NHWC
    patches = jax.lax.conv_general_dilated(
        xi, params["patch_embed"]["w"].astype(dtype), (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = (patches + params["patch_embed"]["b"].astype(dtype))
    lat = patches.reshape(b, gh * gw, cfg.hidden)
    if "pos_embed_table" in params:
        # converted checkpoints carry the model's own table — center-crop
        # it instead of recomputing (guards against sin/cos axis-order
        # drift vs the training-time convention)
        m = int(math.isqrt(params["pos_embed_table"].shape[0]))
        tab = params["pos_embed_table"].reshape(m, m, cfg.hidden)
        top, left = (m - gh) // 2, (m - gw) // 2
        pos = tab[top:top + gh, left:left + gw].reshape(gh * gw, cfg.hidden)
    else:
        pos = _cropped_pos_embed(cfg, gh, gw)
    lat = lat + pos.astype(dtype)[None]

    temb = timestep_fourier(t, cfg.time_embed_dim).astype(dtype)
    temb = _dense(params["time_mlp"]["fc2"],
                  jax.nn.silu(_dense(params["time_mlp"]["fc1"], temb)))
    pemb = _dense(params["pooled_mlp"]["fc2"],
                  jax.nn.silu(_dense(params["pooled_mlp"]["fc1"],
                                     pooled.astype(dtype))))
    emb = temb + pemb

    ctx = _dense(params["context_embedder"], context)

    n_blocks = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        lat, ctx = _block(blk, lat, ctx, emb, cfg,
                          pre_only=(i == n_blocks - 1))

    # final AdaLN-continuous + head (chunk order [scale, shift], like the
    # context pre-only norm)
    mo = _dense(params["ada_out"], jax.nn.silu(emb))
    scale, shift = jnp.split(mo, 2, axis=-1)
    lat = _modulate(_layer_norm(lat), shift, scale)
    out = _dense(params["proj_out"], lat)  # [B, gh*gw, p*p*C]

    out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
    out = out.transpose(0, 5, 1, 3, 2, 4).reshape(b, cfg.out_channels,
                                                  gh * p, gw * p)
    return out
