"""Helper projection/attention modules for the id→ada encoders.

Functional JAX equivalents of the reference's helper nn.Modules
(`adaface/subj_basis_generator.py:60-368`): ExpandEmbs, CrossAttention
(with optional q-aware multi-to_v, v-skip and identity out), Perceiver
attention, LearnedSoftAggregate, and the ConsistentID `ProjPlusModel`
equivalent (faceid → 4 global id tokens cross-attended with CLIP image
features, `face_id_to_ada_prompt.py:833-865`).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _dense(rng, cin, cout, bias=True, std=None):
    std = std or 1.0 / math.sqrt(cin)
    p = {"w": jax.random.normal(rng, (cin, cout), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _apply_dense(p, x):
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln_params(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _apply_ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


# -- ExpandEmbs: [B, D_in] -> [B, K, D_out] ---------------------------------


def init_expand_embs(rng, d_in, d_out, expansion_ratio):
    return {"proj": _dense(rng, d_in, d_out * expansion_ratio),
            "ln": _ln_params(d_out)}


def apply_expand_embs(p, x):
    d_out = p["ln"]["scale"].shape[0]
    y = _apply_dense(p["proj"], x)
    y = y.reshape(x.shape[0], -1, d_out)
    return _apply_ln(p["ln"], y)


# -- CrossAttention (bg prompt_translator) ----------------------------------


def init_cross_attention(
    rng, dim, num_heads=6, identity_to_v=False, v_has_skip=True,
    identity_to_out=True, out_has_skip=False,
):
    # identity_to_v / identity_to_out are encoded by the absence of
    # to_v / to_out params (so config never pollutes the grad pytree)
    ks = iter(jax.random.split(rng, 8))
    p: Params = {
        "ln_q": _ln_params(dim),
        "ln_k": _ln_params(dim),
        "to_q": _dense(next(ks), dim, dim, bias=False),
        "to_k": _dense(next(ks), dim, dim, bias=False),
    }
    if not identity_to_v:
        p["to_v"] = _dense(next(ks), dim, dim, bias=False)
    if not identity_to_out:
        p["to_out"] = _dense(next(ks), dim, dim, bias=False)
    return p


def apply_cross_attention(p, queries, context, num_heads=6,
                          v_has_skip=True, out_has_skip=False):
    h = num_heads
    b, nq, d = queries.shape
    hd = d // h
    q = _apply_dense(p["to_q"], _apply_ln(p["ln_q"], queries))
    ctx_ln = _apply_ln(p["ln_k"], context)
    k = _apply_dense(p["to_k"], ctx_ln)
    if "to_v" not in p:
        v = context
    else:
        v = _apply_dense(p["to_v"], context)
        if v_has_skip:
            v = v + context

    def split(t):
        return t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, d)
    if "to_out" in p:
        o = _apply_dense(p["to_out"], out)
        out = o + out if out_has_skip else o
    return out


# -- PerceiverAttention (latent queries attend over [latents; features]) ----


def init_perceiver_attention(rng, dim, dim_head=64, num_heads=8):
    ks = iter(jax.random.split(rng, 4))
    inner = dim_head * num_heads
    return {
        "ln_x": _ln_params(dim),
        "ln_lat": _ln_params(dim),
        "to_q": _dense(next(ks), dim, inner, bias=False),
        "to_kv": _dense(next(ks), dim, inner * 2, bias=False),
        "to_out": _dense(next(ks), inner, dim, bias=False),
    }


def apply_perceiver_attention(p, x, latents, num_heads=8, dim_head=64):
    h = num_heads
    hd = dim_head
    b = x.shape[0]
    x = _apply_ln(p["ln_x"], x)
    lat = _apply_ln(p["ln_lat"], latents)
    q = _apply_dense(p["to_q"], lat)
    kv_in = jnp.concatenate([x, lat], axis=1)
    k, v = jnp.split(_apply_dense(p["to_kv"], kv_in), 2, axis=-1)

    def split(t):
        return t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, latents.shape[1], -1)
    return _apply_dense(p["to_out"], out)


# -- LearnedSoftAggregate ---------------------------------------------------


def init_learned_soft_aggregate(rng, feat_dim):
    return {"attn": _dense(rng, feat_dim, 1, bias=False)}


def apply_learned_soft_aggregate(p, x, group_dim=1, keepdim=False):
    scores = _apply_dense(p["attn"], x)  # [..., 1]
    w = jax.nn.softmax(scores, axis=group_dim)
    return (x * w).sum(axis=group_dim, keepdims=keepdim)


# -- ConsistentID ProjPlusModel equivalent ----------------------------------


def _init_perceiver_ff(rng, dim, mult=4):
    """LayerNorm → Linear(dim→dim·mult, no bias) → GELU → Linear(no bias),
    the IP-Adapter resampler FeedForward used by ConsistentID."""
    ks = iter(jax.random.split(rng, 2))
    return {
        "ln": _ln_params(dim),
        "fc1": _dense(next(ks), dim, dim * mult, bias=False),
        "fc2": _dense(next(ks), dim * mult, dim, bias=False),
    }


def _apply_perceiver_ff(p, x):
    # torch nn.GELU() is the exact erf form
    return _apply_dense(
        p["fc2"], jax.nn.gelu(_apply_dense(p["fc1"], _apply_ln(p["ln"], x)),
                              approximate=False))


def init_proj_plus(rng, id_dim=512, clip_dim=1280, out_dim=768, num_tokens=4,
                   depth=4, dim_head=64, ff_mult=4):
    """ConsistentID `ProjPlusModel` (IP-Adapter FaceID-Plus layout, loaded
    by `face_id_to_ada_prompt.py:747-749` from ConsistentID-v1.bin):
    id-MLP → [B, num_tokens, out_dim] latents → FacePerceiverResampler
    (proj_in over CLIP features, depth× (PerceiverAttention+FF) residual
    blocks, proj_out, norm_out). Real checkpoints use out_dim=768,
    dim_head=64 → 12 heads; tiny test configs shrink dim_head to fit."""
    dim_head = min(dim_head, out_dim)
    heads = out_dim // dim_head
    ks = iter(jax.random.split(rng, 6 + 2 * depth))
    return {
        "proj": {
            "fc1": _dense(next(ks), id_dim, id_dim * 2),
            "fc2": _dense(next(ks), id_dim * 2, out_dim * num_tokens),
        },
        "norm": _ln_params(out_dim),
        "resampler": {
            "proj_in": _dense(next(ks), clip_dim, out_dim),
            "proj_out": _dense(next(ks), out_dim, out_dim),
            "norm_out": _ln_params(out_dim),
            "layers": [
                {"attn": init_perceiver_attention(next(ks), out_dim,
                                                  dim_head=dim_head,
                                                  num_heads=heads),
                 "ff": _init_perceiver_ff(next(ks), out_dim, mult=ff_mult)}
                for _ in range(depth)
            ],
        },
    }


def apply_proj_plus(p, faceid_embs, clip_image_embeds, shortcut=False,
                    scale=1.0, dim_head=64):
    """faceid [B,512] + CLIP features [B,257,Dclip] → [B,4,768] global id
    embeddings (ConsistentID `image_proj_model` call convention,
    `face_id_to_ada_prompt.py:855-863`)."""
    b = faceid_embs.shape[0]
    out_dim = p["norm"]["scale"].shape[0]
    dim_head = min(dim_head, out_dim)
    heads = out_dim // dim_head
    h = _apply_dense(p["proj"]["fc2"],
                     jax.nn.gelu(_apply_dense(p["proj"]["fc1"], faceid_embs),
                                 approximate=False))
    tokens = _apply_ln(p["norm"], h.reshape(b, -1, out_dim))
    r = p["resampler"]
    x = _apply_dense(r["proj_in"], clip_image_embeds)
    latents = tokens
    for lyr in r["layers"]:
        latents = apply_perceiver_attention(
            lyr["attn"], x, latents, num_heads=heads,
            dim_head=dim_head) + latents
        latents = _apply_perceiver_ff(lyr["ff"], latents) + latents
    out = _apply_ln(r["norm_out"], _apply_dense(r["proj_out"], latents))
    if shortcut:
        return tokens + scale * out
    return out
