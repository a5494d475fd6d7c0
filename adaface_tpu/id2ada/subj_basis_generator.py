"""SubjBasisGenerator — the trainable inverse encoder at the heart of AdaFace.

Functional JAX rebuild of `adaface/subj_basis_generator.py:371-906`
(`ImgPrompt2TextPrompt` + `SubjBasisGenerator`):

Foreground (subject) path:
  img-prompt embeddings [B, N_ID, 768] → spliced into a cached
  "photo of a , , …" template at the filler positions → full trainable
  CLIP-L pass (`prompt2token_proj`, our `models.clip.text_encode`) with
  learnable last-3-hidden-layer weights (init [1,2,4], 5× gradient,
  `initialize_hidden_state_layer_weights:772-789`) and optional MKV-extended
  attention → sliced back out as the ada id embeddings, with optional
  static image-suffix embeddings (`inverse_img_prompt_embs:443-562`) and
  CFG-style mixing toward the cached pad-token embeddings
  (`forward:760-768`).

Background path (legacy, used when placeholder_is_bg): CLIP image features
→ linear+LN `bg_proj_in` → latent-query CrossAttention prompt_translator
scaled by dim**-0.5 (`:631-664,745-757`).

Unlike the reference, the template token ids / slice positions are computed
from the tokenizer rather than hard-coded to 4:20, so the module works with
any vocab (including the offline fallback).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.id2ada.layers import (
    apply_cross_attention,
    apply_expand_embs,
    init_cross_attention,
    init_expand_embs,
)
from adaface_tpu.models import clip as clip_mod
from adaface_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer
from adaface_tpu.utils.tensor import gen_gradient_scaler

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SubjBasisConfig:
    num_id_vecs: int = 16  # arc2face 16, consistentID 4
    num_static_img_suffix_embs: int = 0
    output_dim: int = 768
    max_prompt_length: int = 77
    placeholder_is_bg: bool = False
    bg_image_embedding_dim: int = 1024
    obj_embedding_dim: int = 384
    num_bg_encoder_heads: int = 6
    learnable_hidden_state_weights: bool = True
    hidden_weights_grad_scale: float = 5.0
    num_out_embs_bg: int = 64  # 16*4 for the bg path
    # layerwise projection (dormant in the reference: `use_layerwise_proj`
    # defaults False and is never enabled; `subj_basis_generator.py:615-620`)
    use_layerwise_proj: bool = False
    layerwise_num_layers: int = 16
    layerwise_dim_mult: int = 2
    clip: clip_mod.CLIPTextConfig = clip_mod.CLIP_L_TEXT


def _build_template(
    tokenizer: CLIPTokenizer, n_fillers: int, max_length: int
) -> tuple[np.ndarray, int]:
    """Tokenize 'photo of a ' + ', '*N; return (ids [S], first filler pos)."""
    template = "photo of a " + ", " * n_fillers
    ids = tokenizer([template], max_length=max_length)[0]
    comma_id = tokenizer.encode_text(",")[0]
    first = int(np.argmax(ids == comma_id))
    assert ids[first] == comma_id, "template tokenization has no filler token"
    return ids, first


def init_subj_basis_generator(
    rng: jax.Array,
    cfg: SubjBasisConfig = SubjBasisConfig(),
    clip_text_params: Params | None = None,
    tokenizer: CLIPTokenizer | None = None,
) -> Params:
    """Returns {'params': trainable, 'buffers': static} pytrees.

    clip_text_params: pretrained CLIP-L text params for prompt2token_proj
    (random-init if None). The reference freezes only the token/positional
    embeddings of prompt2token_proj (`freeze_prompt2token_proj`) — mirrored
    here by keeping them in buffers.
    """
    tokenizer = tokenizer or default_tokenizer()
    ks = iter(jax.random.split(rng, 8))
    buffers: Params = {}
    params: Params = {}

    if not cfg.placeholder_is_bg:
        ctp = clip_text_params or clip_mod.init_text_params(next(ks), cfg.clip)
        # frozen embedding tables live in buffers; the transformer is trainable
        buffers["token_embedding"] = ctp["token_embedding"]
        buffers["position_embedding"] = ctp["position_embedding"]
        params["prompt2token_proj"] = {
            "layers": ctp["layers"],
            "final_ln": ctp["final_ln"],
        }
        if cfg.learnable_hidden_state_weights:
            params["hidden_state_layer_weights"] = jnp.asarray(
                [[1.0], [2.0], [4.0]], jnp.float32
            )
        if cfg.num_static_img_suffix_embs > 0:
            params["static_img_suffix_embs"] = (
                jax.random.normal(
                    next(ks), (1, cfg.num_static_img_suffix_embs, cfg.output_dim)
                )
            )
        params["obj_proj_in"] = init_expand_embs(
            next(ks), cfg.obj_embedding_dim, cfg.output_dim, cfg.num_id_vecs
        )
        if cfg.use_layerwise_proj:
            d, l, m = cfg.output_dim, cfg.layerwise_num_layers, cfg.layerwise_dim_mult
            k1, k2 = jax.random.split(next(ks))
            params["layerwise_proj"] = {
                "w1": jax.random.normal(k1, (d, l * m * d)) / np.sqrt(d),
                "b1": jnp.zeros((l * m * d,)),
                "w2": jax.random.normal(k2, (m * d, d)) / np.sqrt(m * d),
                "b2": jnp.zeros((d,)),
                "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            }
        # template: N_ID + 2 fillers — the reference's no-extra-words branch
        # (`inverse_img_prompt_embs`, `subj_basis_generator.py:543`) does NOT
        # lengthen the template for static suffix embs; when enabled they
        # overwrite whatever tokens sit at ID_END:ID_END+N_SFX
        n_fillers = cfg.num_id_vecs + 2
        ids, id_start = _build_template(tokenizer, n_fillers, cfg.max_prompt_length)
        buffers["template_ids"] = jnp.asarray(ids, jnp.int32)
        buffers["id_start"] = int(id_start)
        # pad embeddings: token+pos embeddings of an all-pad prompt
        pad_ids = np.full((cfg.max_prompt_length,), tokenizer.pad_token_id, np.int32)
        pad_embs = (
            buffers["token_embedding"][jnp.asarray(pad_ids)]
            + buffers["position_embedding"][: cfg.max_prompt_length]
        )
        buffers["pad_embeddings"] = pad_embs
    else:
        params["bg_proj_in"] = {
            "proj": {
                "w": jax.random.normal(
                    next(ks), (cfg.bg_image_embedding_dim, cfg.output_dim)
                )
                / np.sqrt(cfg.bg_image_embedding_dim)
            },
            "ln": {"scale": jnp.ones((cfg.output_dim,)), "bias": jnp.zeros((cfg.output_dim,))},
        }
        params["pos_embs"] = jnp.zeros((1, 257, cfg.output_dim))
        params["pos_embs_ln"] = {"scale": jnp.ones((cfg.output_dim,)),
                                 "bias": jnp.zeros((cfg.output_dim,))}
        params["latent_queries"] = jax.random.normal(
            next(ks), (1, cfg.num_out_embs_bg, cfg.output_dim)
        )
        params["latent_queries_ln"] = {"scale": jnp.ones((cfg.output_dim,)),
                                       "bias": jnp.zeros((cfg.output_dim,))}
        params["prompt_translator"] = init_cross_attention(
            next(ks), cfg.output_dim, num_heads=cfg.num_bg_encoder_heads,
            identity_to_v=False, v_has_skip=True, identity_to_out=True,
        )
    return {"params": params, "buffers": buffers}


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps
    )
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def inverse_img_prompt_embs(
    sbg: Params,
    cfg: SubjBasisConfig,
    face_prompt_embs: jax.Array,  # [B, N_ID, 768]
    return_emb_types: tuple[str, ...] = ("core",),
    hidden_state_layer_weights: jax.Array | None = None,
    enable_static_img_suffix_embs: bool = False,
):
    """Template splice → prompt2token_proj pass → sliced embeddings.

    Emb types (`subj_basis_generator.py:524-562`): 'core' (the N_ID[+N_SFX]
    id embeddings), 'full' (all 77), 'full_pad' (tail replaced by pad
    embeddings), 'full_half_pad' (half the tail replaced).
    """
    params, buffers = sbg["params"], sbg["buffers"]
    b = face_prompt_embs.shape[0]
    n_id = cfg.num_id_vecs
    n_sfx = cfg.num_static_img_suffix_embs
    # id_start is a static slice position; device_put may have converted it
    # to a (concrete) array — coerce back to a python int
    id_start = int(buffers["id_start"])
    id_end = id_start + n_id
    pad_begin = id_end + n_sfx + 2

    ids = jnp.broadcast_to(buffers["template_ids"], (b, buffers["template_ids"].shape[0]))
    token_embs = buffers["token_embedding"][ids]
    token_embs = token_embs.at[:, id_start:id_end].set(
        face_prompt_embs.astype(token_embs.dtype)
    )
    if enable_static_img_suffix_embs and n_sfx > 0:
        sfx = jnp.broadcast_to(
            params["static_img_suffix_embs"][:, :n_sfx], (b, n_sfx, cfg.output_dim)
        )
        token_embs = token_embs.at[:, id_end:id_end + n_sfx].set(
            sfx.astype(token_embs.dtype)
        )

    clip_params = {
        "token_embedding": buffers["token_embedding"],
        "position_embedding": buffers["position_embedding"],
        **params["prompt2token_proj"],
    }
    out = clip_mod.text_encode(
        clip_params,
        ids,
        cfg.clip,
        input_embs=token_embs,
        skip_weights=hidden_state_layer_weights,
    )
    prompt_embs = out["last_hidden_state"]

    core_end = id_end + n_sfx if enable_static_img_suffix_embs else id_end
    results = []
    for t in return_emb_types:
        if t == "core":
            results.append(prompt_embs[:, id_start:core_end])
        elif t == "full":
            results.append(prompt_embs)
        elif t == "full_pad":
            pad = buffers["pad_embeddings"].astype(prompt_embs.dtype)
            p2 = prompt_embs.at[:, pad_begin:-1].set(pad[pad_begin:-1])
            results.append(p2)
        elif t == "full_half_pad":
            pad = buffers["pad_embeddings"].astype(prompt_embs.dtype)
            pads = prompt_embs.shape[1] - pad_begin - 1
            if pads >= 2:
                p2 = prompt_embs.at[:, pad_begin:pad_begin + pads // 2].set(
                    pad[pad_begin:pad_begin + pads // 2]
                )
            else:
                p2 = prompt_embs
            results.append(p2)
        else:
            raise ValueError(f"unknown emb type {t}")
    return tuple(results)


def subj_basis_forward(
    sbg: Params,
    face_prompt_embs: jax.Array | None,  # [B, N_ID, 768] (fg path)
    cfg: SubjBasisConfig = SubjBasisConfig(),
    clip_features: jax.Array | None = None,  # [B, 257, Dclip] (bg path)
    raw_id_embs: jax.Array | None = None,  # [B, 384] DINO (non-face subjects)
    out_id_embs_cfg_scale: float = 1.0,
    is_face: bool = True,
    enable_static_img_suffix_embs: bool = False,
) -> jax.Array:
    """→ ada embeddings [B, N_ID(+N_SFX), 768] (`forward:692-770`)."""
    params, buffers = sbg["params"], sbg["buffers"]

    if cfg.placeholder_is_bg:
        feats = _apply_bg_proj(params["bg_proj_in"], clip_features)
        feats = feats + _ln(params["pos_embs_ln"], params["pos_embs"])
        b = feats.shape[0]
        queries = jnp.broadcast_to(
            _ln(params["latent_queries_ln"], params["latent_queries"]),
            (b, params["latent_queries"].shape[1], cfg.output_dim),
        )
        out = apply_cross_attention(params["prompt_translator"], queries, feats,
                                    num_heads=cfg.num_bg_encoder_heads)
        return out * (cfg.output_dim ** -0.5)

    if is_face:
        hw = None
        if "hidden_state_layer_weights" in params:
            scaler = gen_gradient_scaler(cfg.hidden_weights_grad_scale)
            hw = scaler(params["hidden_state_layer_weights"])
        (ada_id_embs,) = inverse_img_prompt_embs(
            sbg, cfg, face_prompt_embs, ("core",),
            hidden_state_layer_weights=hw,
            enable_static_img_suffix_embs=enable_static_img_suffix_embs,
        )
    else:
        ada_id_embs = apply_expand_embs(params["obj_proj_in"], raw_id_embs)

    out = ada_id_embs
    if out_id_embs_cfg_scale != 1.0:
        # CFG mix toward pad embeddings; never on the static suffix embs
        n_id = cfg.num_id_vecs
        id_start = int(buffers["id_start"])
        pad = buffers["pad_embeddings"][id_start:id_start + n_id]
        mixed = (
            ada_id_embs[:, :n_id] * out_id_embs_cfg_scale
            + pad[None].astype(ada_id_embs.dtype) * (1.0 - out_id_embs_cfg_scale)
        )
        out = out.at[:, :n_id].set(mixed)
    if cfg.use_layerwise_proj and is_face:
        # [B,N,D] -> [B,L,N,D]: per-UNet-layer ada embeddings
        # (`LayerwiseMLPProjWithSkip`, `subj_basis_generator.py:61-77,759`).
        # The reference's dormant path adds the skip via `unsqueeze(1)`,
        # which lines the token dim up against the layer dim (both 16);
        # here the skip broadcasts over layers as the comment there intends,
        # and CFG token-mixing happens before the projection.
        out = _apply_layerwise_proj(
            params["layerwise_proj"], out,
            cfg.layerwise_num_layers, cfg.layerwise_dim_mult)
    return out


def _apply_layerwise_proj(p, x, num_layers: int, dim_mult: int):
    """[B,N,D] → [B,L,N,D]: wide linear → GELU → linear, +skip, LN."""
    b, n, d = x.shape
    h = jnp.einsum("bnd,de->bne", x, p["w1"].astype(x.dtype)) + p["b1"]
    h = jax.nn.gelu(h.reshape(b, n, num_layers, dim_mult * d))
    y = jnp.einsum("bnlh,hd->bnld", h, p["w2"].astype(x.dtype)) + p["b2"]
    y = _ln(p["ln"], y + x[:, :, None])
    return y.transpose(0, 2, 1, 3)


def _apply_bg_proj(p, x):
    y = jnp.einsum("...i,io->...o", x, p["proj"]["w"].astype(x.dtype))
    return _ln(p["ln"], y)


# -- weight surgery passthroughs -------------------------------------------


def extend_prompt2token_proj_attention(
    sbg: Params, rng: jax.Array, multipliers: list[int], perturb_std: float = 0.1,
    cfg: SubjBasisConfig = SubjBasisConfig(),
) -> Params:
    """MKV-extend prompt2token_proj (`extend_prompt2token_proj_attention:
    791-815`); multiplier becomes implicit in the k/v shapes."""
    proj = dict(sbg["params"]["prompt2token_proj"])
    fake = {"layers": proj["layers"]}
    ext = clip_mod.extend_mkv(fake, rng, multipliers, perturb_std)
    proj["layers"] = ext["layers"]
    out = {"params": dict(sbg["params"]), "buffers": sbg["buffers"]}
    out["params"]["prompt2token_proj"] = proj
    return out


def squeeze_prompt2token_proj_attention(
    sbg: Params, divisors: list[int], cfg: SubjBasisConfig = SubjBasisConfig(),
) -> Params:
    proj = dict(sbg["params"]["prompt2token_proj"])
    fake = {"layers": proj["layers"]}
    sq = clip_mod.squeeze_mkv(fake, divisors)
    proj["layers"] = sq["layers"]
    out = {"params": dict(sbg["params"]), "buffers": sbg["buffers"]}
    out["params"]["prompt2token_proj"] = proj
    return out
