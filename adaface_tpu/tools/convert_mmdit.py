"""Convert SD3 MMDiT checkpoints (diffusers `SD3Transformer2DModel`
layout) to `models/mmdit.py` param pytrees, plus the reverse mapping for
round-trip tests without diffusers installed.

Conv weights: torch [O,I,H,W] → HWIO. Linear: [O,I] → [I,O].
The checkpoint's `pos_embed.pos_embed` table (when present) is carried
as `pos_embed_table` so the position embedding matches the training-time
sin/cos convention exactly.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.mmdit import SD3_MEDIUM, MMDiTConfig


def _lw(a):
    return jnp.asarray(np.asarray(a).T.copy())


def _dense(sd, p):
    return {"w": _lw(sd[f"{p}.weight"]), "b": jnp.asarray(sd[f"{p}.bias"])}


def convert_mmdit(sd: Mapping[str, np.ndarray],
                  cfg: MMDiTConfig = SD3_MEDIUM) -> dict:
    params = {
        "patch_embed": {
            "w": jnp.asarray(np.asarray(
                sd["pos_embed.proj.weight"]).transpose(2, 3, 1, 0).copy()),
            "b": jnp.asarray(sd["pos_embed.proj.bias"]),
        },
        "time_mlp": {
            "fc1": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
            "fc2": _dense(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "pooled_mlp": {
            "fc1": _dense(sd, "time_text_embed.text_embedder.linear_1"),
            "fc2": _dense(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "context_embedder": _dense(sd, "context_embedder"),
        "blocks": [],
        "ada_out": _dense(sd, "norm_out.linear"),
        "proj_out": _dense(sd, "proj_out"),
    }
    if "pos_embed.pos_embed" in sd:
        tab = np.asarray(sd["pos_embed.pos_embed"])
        params["pos_embed_table"] = jnp.asarray(tab.reshape(-1, tab.shape[-1]))
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}"
        pre_only = f"{b}.attn.to_add_out.weight" not in sd
        blk = {
            "ada_x": _dense(sd, f"{b}.norm1.linear"),
            "ada_ctx": _dense(sd, f"{b}.norm1_context.linear"),
            "attn": {
                "q": _dense(sd, f"{b}.attn.to_q"),
                "k": _dense(sd, f"{b}.attn.to_k"),
                "v": _dense(sd, f"{b}.attn.to_v"),
                "o": _dense(sd, f"{b}.attn.to_out.0"),
            },
            "attn_ctx": {
                "q": _dense(sd, f"{b}.attn.add_q_proj"),
                "k": _dense(sd, f"{b}.attn.add_k_proj"),
                "v": _dense(sd, f"{b}.attn.add_v_proj"),
            },
            "mlp_x": {"fc1": _dense(sd, f"{b}.ff.net.0.proj"),
                      "fc2": _dense(sd, f"{b}.ff.net.2")},
        }
        if cfg.qk_norm:
            blk["attn"]["q_rms"] = jnp.asarray(sd[f"{b}.attn.norm_q.weight"])
            blk["attn"]["k_rms"] = jnp.asarray(sd[f"{b}.attn.norm_k.weight"])
            blk["attn_ctx"]["q_rms"] = jnp.asarray(
                sd[f"{b}.attn.norm_added_q.weight"])
            blk["attn_ctx"]["k_rms"] = jnp.asarray(
                sd[f"{b}.attn.norm_added_k.weight"])
        if not pre_only:
            blk["attn_ctx"]["o"] = _dense(sd, f"{b}.attn.to_add_out")
            blk["mlp_ctx"] = {"fc1": _dense(sd, f"{b}.ff_context.net.0.proj"),
                              "fc2": _dense(sd, f"{b}.ff_context.net.2")}
        params["blocks"].append(blk)
    return params


def export_mmdit_to_diffusers(params: dict,
                              cfg: MMDiTConfig = SD3_MEDIUM) -> dict:
    """Inverse of convert_mmdit (numpy outputs, torch layouts)."""
    sd: dict[str, np.ndarray] = {}

    def put_dense(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T.copy()
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    sd["pos_embed.proj.weight"] = np.asarray(
        params["patch_embed"]["w"]).transpose(3, 2, 0, 1).copy()
    sd["pos_embed.proj.bias"] = np.asarray(params["patch_embed"]["b"])
    if "pos_embed_table" in params:
        sd["pos_embed.pos_embed"] = np.asarray(params["pos_embed_table"])
    put_dense("time_text_embed.timestep_embedder.linear_1",
              params["time_mlp"]["fc1"])
    put_dense("time_text_embed.timestep_embedder.linear_2",
              params["time_mlp"]["fc2"])
    put_dense("time_text_embed.text_embedder.linear_1",
              params["pooled_mlp"]["fc1"])
    put_dense("time_text_embed.text_embedder.linear_2",
              params["pooled_mlp"]["fc2"])
    put_dense("context_embedder", params["context_embedder"])
    for i, blk in enumerate(params["blocks"]):
        b = f"transformer_blocks.{i}"
        put_dense(f"{b}.norm1.linear", blk["ada_x"])
        put_dense(f"{b}.norm1_context.linear", blk["ada_ctx"])
        put_dense(f"{b}.attn.to_q", blk["attn"]["q"])
        put_dense(f"{b}.attn.to_k", blk["attn"]["k"])
        put_dense(f"{b}.attn.to_v", blk["attn"]["v"])
        put_dense(f"{b}.attn.to_out.0", blk["attn"]["o"])
        put_dense(f"{b}.attn.add_q_proj", blk["attn_ctx"]["q"])
        put_dense(f"{b}.attn.add_k_proj", blk["attn_ctx"]["k"])
        put_dense(f"{b}.attn.add_v_proj", blk["attn_ctx"]["v"])
        put_dense(f"{b}.ff.net.0.proj", blk["mlp_x"]["fc1"])
        put_dense(f"{b}.ff.net.2", blk["mlp_x"]["fc2"])
        if "q_rms" in blk["attn"]:
            sd[f"{b}.attn.norm_q.weight"] = np.asarray(blk["attn"]["q_rms"])
            sd[f"{b}.attn.norm_k.weight"] = np.asarray(blk["attn"]["k_rms"])
            sd[f"{b}.attn.norm_added_q.weight"] = np.asarray(
                blk["attn_ctx"]["q_rms"])
            sd[f"{b}.attn.norm_added_k.weight"] = np.asarray(
                blk["attn_ctx"]["k_rms"])
        if "o" in blk["attn_ctx"]:
            put_dense(f"{b}.attn.to_add_out", blk["attn_ctx"]["o"])
            put_dense(f"{b}.ff_context.net.0.proj", blk["mlp_ctx"]["fc1"])
            put_dense(f"{b}.ff_context.net.2", blk["mlp_ctx"]["fc2"])
    put_dense("norm_out.linear", params["ada_out"])
    put_dense("proj_out", params["proj_out"])
    return sd
