"""AutoencoderKL (SD VAE) with the masked-encoder variant, functional JAX.

Rebuild of `ldm/models/autoencoder.py` + `ldm/modules/diffusionmodules/
model.py` (CompVis layout): 128-ch encoder with ch_mult (1,2,4,4), mid-block
single-head attention, 8-channel moments + DiagonalGaussian, 0.18215 latent
scaling.

Masked encoding (`autoencoder.py:49-53`, `model.py:179-241`): the fg/aug
masks act only on the mid-block attention — after softmax, probabilities of
heterogeneous pixel pairs (one fg, one bg) are zeroed (not renormalized),
so background never contaminates foreground latents and vice versa.

NHWC on-device; NCHW interface.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from adaface_tpu.ops.attention import multi_head_attention
from adaface_tpu.ops.fused_gn import fused_group_norm_silu
from adaface_tpu.ops.resize import resize_nearest, upsample2x_nearest

Params = dict[str, Any]

SD_LATENT_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    base_ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    norm_groups: int = 32
    norm_eps: float = 1e-6

    @property
    def spatial_scale(self) -> int:
        """Pixel-to-latent downscale factor (8 for the SD VAE)."""
        return 2 ** (len(self.ch_mult) - 1)


SD_VAE = VAEConfig()


def _conv(p, x, stride=1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # NOTE: no preferred_element_type — lax.conv's transpose rule can't mix
    # an f32 cotangent with bf16 operands (breaks jax.grad through the
    # bf16 in-loss decode; same constraint as models/unet.py conv2d). The
    # MXU still accumulates bf16 convs in f32 internally.
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + p["b"].astype(x.dtype))


def _gn(p, x, groups, eps, silu=False):
    return fused_group_norm_silu(x, p["scale"], p["bias"], groups, eps,
                                 apply_silu=silu)


def _gn_swish(p, x, groups, eps):
    return _gn(p, x, groups, eps, silu=True)


def _swish(x):
    return jax.nn.silu(x)


def _init_conv(rng, kh, kw, cin, cout):
    std = 1.0 / math.sqrt(kh * kw * cin)
    return {
        "w": jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_resblock(rng, cin, cout):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(k1, 3, 3, cin, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(k2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(k3, 1, 1, cin, cout)
    return p


def _init_attn(rng, c):
    ks = jax.random.split(rng, 4)
    return {
        "norm": _init_norm(c),
        "q": _init_conv(ks[0], 1, 1, c, c),
        "k": _init_conv(ks[1], 1, 1, c, c),
        "v": _init_conv(ks[2], 1, 1, c, c),
        "proj_out": _init_conv(ks[3], 1, 1, c, c),
    }


def _resblock(p, x, cfg):
    h = _conv(p["conv1"], _gn_swish(p["norm1"], x, cfg.norm_groups, cfg.norm_eps))
    h = _conv(p["conv2"], _gn_swish(p["norm2"], h, cfg.norm_groups, cfg.norm_eps))
    if "nin_shortcut" in p:
        x = _conv(p["nin_shortcut"], x, padding=0)
    return x + h


def _attnblock(p, x, cfg, mask=None):
    """Single-head attention over all spatial positions.

    mask: optional dict {'fg_mask': [B,1,H0,W0]|None, 'aug_mask': …|None}.
    Post-softmax zeroing of heterogeneous fg/bg pairs
    (`model.py:196-233`).
    """
    b, h, w, c = x.shape
    y = _gn(p["norm"], x, cfg.norm_groups, cfg.norm_eps)
    q = _conv(p["q"], y, padding=0).reshape(b, h * w, c)
    k = _conv(p["k"], y, padding=0).reshape(b, h * w, c)
    v = _conv(p["v"], y, padding=0).reshape(b, h * w, c)

    if mask is None or mask.get("fg_mask") is None:
        # unmasked (every decode + unmasked encode): flash attention —
        # the einsum path materializes [B, HW, HW] logits+probs (2 GB fp32
        # at bs32 64×64), pure HBM traffic the fused kernel never writes
        out = multi_head_attention(
            q[:, None], k[:, None], v[:, None],
            scale=1.0 / math.sqrt(c))[:, 0].astype(x.dtype)
        out = _conv(p["proj_out"], out.reshape(b, h, w, c), padding=0)
        return x + out

    logits = jnp.einsum("bic,bjc->bij", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(c)
    probs = jax.nn.softmax(logits, axis=-1)

    fg = mask["fg_mask"].astype(jnp.float32)
    fg = resize_nearest(fg, (h, w))
    bg = 1.0 - fg
    aug = mask.get("aug_mask")
    if aug is not None:
        aug = resize_nearest(aug.astype(jnp.float32), (h, w))
        fg = fg * aug
        bg = bg * aug
    fg2 = fg.reshape(b, h * w)
    bg2 = bg.reshape(b, h * w)
    homo = (jnp.einsum("bi,bj->bij", fg2, fg2)
            + jnp.einsum("bi,bj->bij", bg2, bg2)) > 0
    probs = jnp.where(homo, probs, 0.0)

    out = jnp.einsum("bij,bjc->bic", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = _conv(p["proj_out"], out.reshape(b, h, w, c), padding=0)
    return x + out


# ---------------------------------------------------------------------------


def init_vae_params(rng: jax.Array, cfg: VAEConfig = SD_VAE) -> Params:
    ks = iter(jax.random.split(rng, 96))
    ch = cfg.base_ch
    chs = [ch * m for m in cfg.ch_mult]
    enc: Params = {"conv_in": _init_conv(next(ks), 3, 3, cfg.in_channels, ch),
                   "down": []}
    cin = ch
    for i, cout in enumerate(chs):
        level = {"blocks": []}
        for j in range(cfg.num_res_blocks):
            level["blocks"].append(_init_resblock(next(ks), cin if j == 0 else cout, cout))
        if i < len(chs) - 1:
            level["downsample"] = _init_conv(next(ks), 3, 3, cout, cout)
        enc["down"].append(level)
        cin = cout
    enc["mid"] = {
        "block_1": _init_resblock(next(ks), chs[-1], chs[-1]),
        "attn_1": _init_attn(next(ks), chs[-1]),
        "block_2": _init_resblock(next(ks), chs[-1], chs[-1]),
    }
    enc["norm_out"] = _init_norm(chs[-1])
    enc["conv_out"] = _init_conv(next(ks), 3, 3, chs[-1], 2 * cfg.z_channels)

    dec: Params = {
        "conv_in": _init_conv(next(ks), 3, 3, cfg.z_channels, chs[-1]),
        "mid": {
            "block_1": _init_resblock(next(ks), chs[-1], chs[-1]),
            "attn_1": _init_attn(next(ks), chs[-1]),
            "block_2": _init_resblock(next(ks), chs[-1], chs[-1]),
        },
        "up": [],
    }
    cin = chs[-1]
    for i in reversed(range(len(chs))):
        cout = chs[i]
        level = {"blocks": []}
        for j in range(cfg.num_res_blocks + 1):
            level["blocks"].append(_init_resblock(next(ks), cin if j == 0 else cout, cout))
        if i > 0:
            level["upsample"] = _init_conv(next(ks), 3, 3, cout, cout)
        dec["up"].append(level)  # stored highest-resolution-last like CompVis? see encode order
        cin = cout
    dec["norm_out"] = _init_norm(chs[0])
    dec["conv_out"] = _init_conv(next(ks), 3, 3, chs[0], cfg.in_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _init_conv(next(ks), 1, 1, 2 * cfg.z_channels, 2 * cfg.z_channels),
        "post_quant_conv": _init_conv(next(ks), 1, 1, cfg.z_channels, cfg.z_channels),
    }


def vae_encode_moments(
    params: Params,
    x: jax.Array,  # [B, 3, H, W] in [-1, 1]
    cfg: VAEConfig = SD_VAE,
    mask: dict | None = None,
) -> jax.Array:
    """→ moments [B, 2z, H/8, W/8] (mean ‖ logvar)."""
    p = params["encoder"]
    h = x.transpose(0, 2, 3, 1)
    h = _conv(p["conv_in"], h)
    for i, level in enumerate(p["down"]):
        for blk in level["blocks"]:
            h = _resblock(blk, h, cfg)
        if "downsample" in level:
            # CompVis downsample: asymmetric (0,1) pad + stride-2 conv
            h = _conv(level["downsample"], h, stride=2, padding=[(0, 1), (0, 1)])
    h = _resblock(p["mid"]["block_1"], h, cfg)
    h = _attnblock(p["mid"]["attn_1"], h, cfg, mask=mask)
    h = _resblock(p["mid"]["block_2"], h, cfg)
    h = _conv(p["conv_out"], _gn_swish(p["norm_out"], h, cfg.norm_groups, cfg.norm_eps))
    h = _conv(params["quant_conv"], h, padding=0)
    return h.transpose(0, 3, 1, 2)


def gaussian_sample(moments: jax.Array, rng: jax.Array | None = None):
    """DiagonalGaussianDistribution sample/mode
    (`ldm/modules/distributions/distributions.py`)."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    if rng is None:
        return mean
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def gaussian_kl(moments: jax.Array) -> jax.Array:
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return 0.5 * jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar,
                         axis=(1, 2, 3))


def vae_encode(
    params: Params, x: jax.Array, cfg: VAEConfig = SD_VAE,
    rng: jax.Array | None = None, mask: dict | None = None,
    scale: float = SD_LATENT_SCALE, shift: float = 0.0,
) -> jax.Array:
    """Image → scaled latent [B, 4, H/8, W/8]. rng None → posterior mode.
    shift: SD3-family VAEs subtract a shift_factor before scaling."""
    moments = vae_encode_moments(params, x, cfg, mask=mask)
    return (gaussian_sample(moments, rng) - shift) * scale


def vae_decode(
    params: Params, z: jax.Array, cfg: VAEConfig = SD_VAE,
    scale: float = SD_LATENT_SCALE, shift: float = 0.0,
) -> jax.Array:
    """Scaled latent → image [B, 3, H, W] in [-1, 1]."""
    z = (z / scale + shift).transpose(0, 2, 3, 1)
    z = _conv(params["post_quant_conv"], z, padding=0)
    p = params["decoder"]
    h = _conv(p["conv_in"], z)
    h = _resblock(p["mid"]["block_1"], h, cfg)
    h = _attnblock(p["mid"]["attn_1"], h, cfg)
    h = _resblock(p["mid"]["block_2"], h, cfg)
    for level in p["up"]:
        for blk in level["blocks"]:
            h = _resblock(blk, h, cfg)
        if "upsample" in level:
            h = _conv(level["upsample"], upsample2x_nearest(h))
    h = _conv(p["conv_out"], _gn_swish(p["norm_out"], h, cfg.norm_groups, cfg.norm_eps))
    return h.transpose(0, 3, 1, 2)
