"""CLIP text + vision transformers, pure-functional JAX.

TPU-native rebuild of the three CLIP variants in the reference, with the
monkey-patched behaviors turned into explicit arguments (SURVEY.md §7
"monkey-patching → explicit dataflow"):

- `FrozenCLIPEmbedder`'s patched forwards (`ldm/modules/encoders/modules.py:
  180-338`): CLIP-skip (weighted sum of last-k pre-LN hidden states),
  embedding-manager injection (here: pass `input_embs` directly), position
  embedding extension 77→97/147 (`extend_position_embedding`).
- `CLIPTextModelWrapper` + `CLIPAttentionMKV` (`adaface/arc2face_models.py:
  51-338`): precomputed token embeddings, per-dim hidden-state layer
  weights, K/V projections replicated `multiplier`× and folded into the
  sequence axis (token-interleaved: [t0,t0,t1,t1,…]); `extend_mkv` /
  `squeeze_mkv` weight surgery.
- `CLIPVisionModelWithMask` (`adaface/util.py:316-414`): image mask
  downsampled to the patch grid, class token always attended. The
  reference adds the raw 0/1 pairwise mask to the attn logits (a +1 soft
  bias, an artifact of reusing HF's additive-mask slot); we reproduce
  that exactly by default (`mask_mode="soft_pair"`, golden-tested) and
  offer the evident intent — hard −inf masking — as `mask_mode="hard"`.

Params are nested dicts; linear weights are stored [in, out] (JAX
convention; torch converters transpose). The MKV multiplier of a layer is
implicit in its k/v weight shapes — no flags to keep in sync.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from adaface_tpu.ops.resize import resize_nearest
from adaface_tpu.utils.tensor import perturb_tensor

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 2
    hidden_act: str = "quick_gelu"  # OpenAI CLIP; laion models use "gelu"
    projection_dim: int | None = None  # text_projection (no bias), pooled path


# OpenCLIP ViT-L/14 (SD1.5 text encoder) is the default text config.
CLIP_L_TEXT = CLIPTextConfig()

# laion OpenCLIP ViT-bigG/14 text tower (SDXL text_encoder_2): penultimate
# hidden states feed the UNet context; the projected eos pooled output is
# the SDXL added text embedding.
CLIP_BIGG_TEXT = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1280,
)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    num_channels: int = 3
    projection_dim: int | None = None
    hidden_act: str = "quick_gelu"


CLIP_L_VISION = CLIPVisionConfig()
# laion CLIP-ViT-H-14 (ConsistentID image encoder, 1280-d; laion towers
# use plain gelu, unlike OpenAI's quick_gelu)
CLIP_H_VISION = CLIPVisionConfig(
    hidden_size=1280, num_layers=32, num_heads=16, intermediate_size=5120,
    projection_dim=1024, hidden_act="gelu",
)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {"quick_gelu": quick_gelu, "gelu": jax.nn.gelu}


def layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_linear(rng, d_in, d_out, std=0.02):
    kw, _ = jax.random.split(rng)
    return {
        "w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * std,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_encoder_layer(rng, d, d_mlp):
    ks = jax.random.split(rng, 6)
    return {
        "ln1": _init_ln(d),
        "attn": {
            "q": _init_linear(ks[0], d, d),
            "k": _init_linear(ks[1], d, d),
            "v": _init_linear(ks[2], d, d),
            "o": _init_linear(ks[3], d, d),
        },
        "ln2": _init_ln(d),
        "mlp": {
            "fc1": _init_linear(ks[4], d, d_mlp),
            "fc2": _init_linear(ks[5], d_mlp, d),
        },
    }


def init_text_params(rng: jax.Array, cfg: CLIPTextConfig = CLIP_L_TEXT) -> Params:
    ks = jax.random.split(rng, cfg.num_layers + 2)
    return {
        "token_embedding": jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size), jnp.float32
        )
        * 0.02,
        "position_embedding": jax.random.normal(
            ks[1], (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32
        )
        * 0.01,
        "layers": [
            _init_encoder_layer(ks[2 + i], cfg.hidden_size, cfg.intermediate_size)
            for i in range(cfg.num_layers)
        ],
        "final_ln": _init_ln(cfg.hidden_size),
        **(
            {
                "text_projection": {
                    "w": jax.random.normal(
                        jax.random.fold_in(ks[0], 7),
                        (cfg.hidden_size, cfg.projection_dim), jnp.float32,
                    )
                    * 0.02
                }
            }
            if cfg.projection_dim is not None
            else {}
        ),
    }


def init_vision_params(rng: jax.Array, cfg: CLIPVisionConfig = CLIP_L_VISION) -> Params:
    ks = jax.random.split(rng, cfg.num_layers + 4)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    p = {
        "class_embedding": jax.random.normal(ks[0], (cfg.hidden_size,), jnp.float32)
        * 0.02,
        "patch_embedding": jax.random.normal(
            ks[1],
            (cfg.hidden_size, cfg.num_channels, cfg.patch_size, cfg.patch_size),
            jnp.float32,
        )
        * 0.02,
        "position_embedding": jax.random.normal(
            ks[2], (n_patches + 1, cfg.hidden_size), jnp.float32
        )
        * 0.01,
        "pre_ln": _init_ln(cfg.hidden_size),
        "layers": [
            _init_encoder_layer(ks[3 + i], cfg.hidden_size, cfg.intermediate_size)
            for i in range(cfg.num_layers)
        ],
        "post_ln": _init_ln(cfg.hidden_size),
    }
    if cfg.projection_dim is not None:
        p["visual_projection"] = {
            "w": jax.random.normal(
                ks[-1], (cfg.hidden_size, cfg.projection_dim), jnp.float32
            )
            * 0.02,
            "b": jnp.zeros((cfg.projection_dim,), jnp.float32),
        }
    return p


# ---------------------------------------------------------------------------
# encoder core
# ---------------------------------------------------------------------------


def _mkv_attention(
    p: Params,
    x: jax.Array,
    num_heads: int,
    attn_bias: jax.Array | None,
    causal: bool,
) -> jax.Array:
    """Self-attention where K/V may be MKV-extended.

    k/v weight shape [D, mult*D]; the mult copies fold into the sequence axis
    token-interleaved, matching `CLIPAttentionMKV.forward`
    (`arc2face_models.py:145-231`). attn_bias is additive [B,1,S,S0] over
    *original* key positions and is broadcast across the multiplier.
    """
    b, s, d = x.shape
    hd = d // num_heads
    mult = p["k"]["w"].shape[1] // d

    q = linear(p["q"], x).reshape(b, s, num_heads, hd)
    # [B,S,mult*D] -> [B, S*mult, H, hd]: flattening [S, mult*H*hd] gives
    # token-interleaved copies [t0c0, t0c1, t1c0, t1c1, ...].
    k = linear(p["k"], x).reshape(b, s * mult, num_heads, hd)
    v = linear(p["v"], x).reshape(b, s * mult, num_heads, hd)

    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    bias = jnp.zeros((1, 1, s, s), jnp.float32)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        bias = jnp.where(cols <= rows, 0.0, -1e9)[None, None]
    if attn_bias is not None:
        bias = bias + attn_bias.astype(jnp.float32)
    # expand over the multiplier: key j attends like original token j//mult
    if mult > 1:
        bias = jnp.repeat(bias, mult, axis=-1)
    logits = logits + bias

    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return linear(p["o"], out.reshape(b, s, d))


def _encoder_layer(
    p: Params,
    x: jax.Array,
    num_heads: int,
    eps: float,
    attn_bias: jax.Array | None,
    causal: bool,
    act=quick_gelu,
) -> jax.Array:
    x = x + _mkv_attention(p["attn"], layer_norm(p["ln1"], x, eps), num_heads, attn_bias, causal)
    h = layer_norm(p["ln2"], x, eps)
    h = linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
    return x + h


def _run_encoder(
    layers: list[Params],
    x: jax.Array,
    num_heads: int,
    eps: float,
    attn_bias: jax.Array | None,
    causal: bool,
    act=quick_gelu,
) -> list[jax.Array]:
    """Returns hidden_states list: [embeddings, layer1_out, ..., layerN_out]."""
    states = [x]
    for lp in layers:
        x = _encoder_layer(lp, x, num_heads, eps, attn_bias, causal, act)
        states.append(x)
    return states


# ---------------------------------------------------------------------------
# text model
# ---------------------------------------------------------------------------


def text_encode(
    params: Params,
    input_ids: jax.Array,  # [B, S] int32
    cfg: CLIPTextConfig = CLIP_L_TEXT,
    input_embs: jax.Array | None = None,  # [B, S, D] overrides token lookup
    skip_weights: jax.Array | None = None,  # [k] or [k, D]
    attention_mask: jax.Array | None = None,  # [B, S], 1=keep
    return_hidden_states: bool = False,
    return_pooled: bool = False,
):
    """CLIP text transformer forward.

    skip_weights: weighted sum of the last k entries of the hidden-state
    list (embeddings + per-layer outputs), normalized to sum 1 over the
    layer axis, applied *before* the final layer norm — the union of
    FrozenCLIPEmbedder CLIP-skip (`modules.py:266-338`) and
    CLIPTextModelWrapper hidden_state_layer_weights
    (`arc2face_models.py:292-307`).
    """
    d = cfg.hidden_size
    if input_embs is None:
        input_embs = params["token_embedding"][input_ids]
    s = input_embs.shape[1]
    x = input_embs + params["position_embedding"][None, :s]

    attn_bias = None
    if attention_mask is not None:
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

    states = _run_encoder(
        params["layers"], x, cfg.num_heads, cfg.layer_norm_eps, attn_bias,
        causal=True, act=_ACTS[cfg.hidden_act],
    )
    if skip_weights is not None:
        w = jnp.asarray(skip_weights, jnp.float32)
        if w.ndim == 1:
            w = w[:, None]
        w = w / w.sum(axis=0, keepdims=True)  # [k, 1 or D]
        k = w.shape[0]
        stacked = jnp.stack(states[-k:], axis=0).astype(jnp.float32)  # [k,B,S,D]
        h = (stacked * w[:, None, None, :]).sum(axis=0).astype(x.dtype)
    else:
        h = states[-1]

    out = layer_norm(params["final_ln"], h, cfg.layer_norm_eps)

    results = {"last_hidden_state": out}
    if return_pooled:
        # eos pooling via argmax of token ids (HF eos_token_id==2 legacy path,
        # `arc2face_models.py:313-321`)
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = out[jnp.arange(out.shape[0]), eos_idx]
        results["pooled"] = pooled
        if "text_projection" in params:
            # CLIPTextModelWithProjection (SDXL text_encoder_2): bias-free
            # projection of the eos pooled state
            results["pooled_proj"] = jnp.einsum(
                "bd,dp->bp", pooled,
                params["text_projection"]["w"].astype(pooled.dtype))
    if return_hidden_states:
        results["hidden_states"] = states
    return results


def token_embeddings(params: Params, input_ids: jax.Array) -> jax.Array:
    """return_token_embs path of CLIPTextModelWrapper (`arc2face_models.py:249`)."""
    return params["token_embedding"][input_ids]


# ---------------------------------------------------------------------------
# vision model
# ---------------------------------------------------------------------------


def vision_encode(
    params: Params,
    pixel_values: jax.Array,  # [B, 3, H, W]
    cfg: CLIPVisionConfig = CLIP_L_VISION,
    image_mask: jax.Array | None = None,  # [B, H', W'] fg mask (any resolution)
    return_hidden_states: bool = False,
    mask_mode: str = "soft_pair",  # "soft_pair" (reference) | "hard"
):
    """CLIP vision transformer, optional patch-grid masking.

    image_mask is nearest-resized to the patch grid; the class token is
    always attended (`adaface/util.py:344-354`).

    mask_mode="soft_pair" reproduces the reference exactly: the 0/1
    pairwise mask maskᵢ·maskⱼ is ADDED to the attention logits (HF's
    additive-mask slot, so unmasked pairs get a +1 bias rather than masked
    pairs getting −inf; `adaface/util.py:351-366`). The pretrained
    reference checkpoints were trained under this behavior, so it is the
    default. mask_mode="hard" implements the evident intent — masked
    patches removed from everyone's keys via −inf.
    """
    b = pixel_values.shape[0]
    d = cfg.hidden_size
    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(jnp.float32),
        params["patch_embedding"].astype(jnp.float32),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [B, D, g, g]
    g = patches.shape[-1]
    patches = patches.reshape(b, d, g * g).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, d))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1]]
    x = layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)

    attn_bias = None
    token_mask = None
    if image_mask is not None:
        m = image_mask.astype(jnp.float32)[:, None]  # [B,1,H,W]
        m = resize_nearest(m, (g, g))
        token_mask = jnp.concatenate(
            [jnp.ones((b, 1, 1), jnp.float32), m.reshape(b, 1, g * g)], axis=-1
        )  # [B,1,S]
        if mask_mode == "soft_pair":
            # maskᵀ·mask added raw to the logits (`util.py:351-366`)
            attn_bias = (token_mask[:, :, :, None]
                         * token_mask[:, :, None, :])  # [B,1,S,S]
        elif mask_mode == "hard":
            attn_bias = (token_mask[:, :, None, :] - 1.0) * 1e9  # [B,1,1,S]
        else:
            raise ValueError(f"unknown mask_mode {mask_mode!r}")

    states = _run_encoder(
        params["layers"], x, cfg.num_heads, cfg.layer_norm_eps, attn_bias,
        causal=False, act=_ACTS[cfg.hidden_act],
    )
    last = states[-1]
    pooled = layer_norm(params["post_ln"], last[:, 0], cfg.layer_norm_eps)
    results = {
        "last_hidden_state": last,
        "pooled": pooled,
        "token_mask": token_mask.transpose(0, 2, 1) if token_mask is not None else None,
    }
    if "visual_projection" in params:
        results["image_embeds"] = linear(params["visual_projection"], pooled)
    if return_hidden_states:
        results["hidden_states"] = states
    return results


# ---------------------------------------------------------------------------
# weight surgery
# ---------------------------------------------------------------------------


def extend_position_embedding(params: Params, new_len: int) -> Params:
    """Extend position embeddings by reusing the last rows
    (`extend_nn_embedding`, `adaface/util.py:77-94` via `modules.py:372-383`)."""
    pe = params["position_embedding"]
    cur = pe.shape[0]
    if new_len <= cur:
        return params
    extra = pe[-(new_len - cur):]
    out = dict(params)
    out["position_embedding"] = jnp.concatenate([pe, extra], axis=0)
    return out


def extend_mkv(
    params: Params,
    rng: jax.Array,
    multipliers: list[int],
    perturb_std: float = 0.1,
) -> Params:
    """Extend each layer's K/V projections by its multiplier.

    Weight rows are repeated multiplier× ([mult*D] out-features in torch =
    [D, mult*D] here, tiled along the out axis) and the extra copies are
    noise-perturbed; biases are repeated un-perturbed
    (`CLIPAttentionMKV.extend_weights`, `arc2face_models.py:82-127`).
    """
    out = dict(params)
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        mult = multipliers[i] if i < len(multipliers) else 1
        if mult == 1:
            new_layers.append(lp)
            continue
        lp = jax.tree_util.tree_map(lambda x: x, lp)  # shallow-ish copy
        attn = dict(lp["attn"])
        for name in ("k", "v"):
            w = attn[name]["w"]  # [D, M*D]
            bbias = attn[name]["b"]
            d_in, d_out = w.shape
            tiled = jnp.tile(w, (1, mult))  # [D, mult*M*D]
            rng, sub = jax.random.split(rng)
            extra = perturb_tensor(sub, tiled[:, d_out:], perturb_std)
            attn[name] = {
                "w": jnp.concatenate([tiled[:, :d_out], extra], axis=1),
                "b": jnp.tile(bbias, (mult,)),
            }
        lp = dict(lp)
        lp["attn"] = {**lp["attn"], **attn}
        new_layers.append(lp)
    out["layers"] = new_layers
    return out


def squeeze_mkv(params: Params, divisors: list[int]) -> Params:
    """Average the multiplier copies back down
    (`CLIPAttentionMKV.squeeze_weights`, `arc2face_models.py:129-142`)."""
    out = dict(params)
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        div = divisors[i] if i < len(divisors) else 1
        if div == 1:
            new_layers.append(lp)
            continue
        attn = dict(lp["attn"])
        for name in ("k", "v"):
            w = attn[name]["w"]  # [D, div*M*D]
            bbias = attn[name]["b"]
            d_in, d_out = w.shape
            attn[name] = {
                "w": w.reshape(d_in, div, d_out // div).mean(axis=1),
                "b": bbias.reshape(div, -1).mean(axis=0),
            }
        lp = dict(lp)
        lp["attn"] = {**lp["attn"], **attn}
        new_layers.append(lp)
    out["layers"] = new_layers
    return out


def layer_multipliers(params: Params, cfg: CLIPTextConfig = CLIP_L_TEXT) -> list[int]:
    d = cfg.hidden_size
    return [lp["attn"]["k"]["w"].shape[1] // d for lp in params["layers"]]
