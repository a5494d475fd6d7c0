"""Convert SD1.5 UNet / VAE checkpoints to adaface_tpu param pytrees.

Handles:
- diffusers `UNet2DConditionModel` state dicts (the reference's live
  training path wraps this model, `ddpm.py:4084-4252`),
- CompVis/LDM `AutoencoderKL` state dicts (`first_stage_model.*` inside
  v1-5-pruned.ckpt, the format `scripts/ckpt_lib.py` surgeries operate on),
- diffusers `AutoencoderKL` state dicts (e.g. the 840k-MSE VAE swapped in
  by AdaFaceWrapper, `adaface_wrapper.py:112-226`).

Also provides `export_unet_to_diffusers` (reverse mapping) so checkpoints
produced here remain usable by the torch ecosystem, and to enable
round-trip tests without diffusers installed.

Conv weights: torch [O,I,H,W] → HWIO. Linear: [O,I] → [I,O].
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.unet import SD15_UNET, UNetConfig
from adaface_tpu.models.vae import SD_VAE, VAEConfig


def _cw(a):  # conv weight
    return jnp.asarray(np.asarray(a).transpose(2, 3, 1, 0).copy())


def _lw(a):  # linear weight
    return jnp.asarray(np.asarray(a).T.copy())


def _conv(sd, p):
    return {"w": _cw(sd[f"{p}.weight"]), "b": jnp.asarray(sd[f"{p}.bias"])}


def _dense(sd, p):
    return {"w": _lw(sd[f"{p}.weight"]), "b": jnp.asarray(sd[f"{p}.bias"])}


def _norm(sd, p):
    return {"scale": jnp.asarray(sd[f"{p}.weight"]),
            "bias": jnp.asarray(sd[f"{p}.bias"])}


# ---------------------------------------------------------------------------
# UNet (diffusers naming)
# ---------------------------------------------------------------------------


def _unet_resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "time_emb_proj": _dense(sd, f"{p}.time_emb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _unet_attention(sd, p):
    out = {
        "q": {"w": _lw(sd[f"{p}.to_q.weight"])},
        "k": {"w": _lw(sd[f"{p}.to_k.weight"])},
        "v": {"w": _lw(sd[f"{p}.to_v.weight"])},
        "o": _dense(sd, f"{p}.to_out.0"),
    }
    return out


def _proj_conv(sd, p):
    """proj_in/proj_out: 1×1 conv, or linear when the model uses
    use_linear_projection (SDXL) — stored uniformly as 1×1 conv."""
    w = np.asarray(sd[f"{p}.weight"])
    if w.ndim == 2:  # [O, I] linear → [1, 1, I, O]
        return {"w": jnp.asarray(w.T[None, None].copy()),
                "b": jnp.asarray(sd[f"{p}.bias"])}
    return _conv(sd, p)


def _unet_transformer_block(sd, b):
    return {
        "norm1": _norm(sd, f"{b}.norm1"),
        "attn1": _unet_attention(sd, f"{b}.attn1"),
        "norm2": _norm(sd, f"{b}.norm2"),
        "attn2": _unet_attention(sd, f"{b}.attn2"),
        "norm3": _norm(sd, f"{b}.norm3"),
        "ff": {
            "proj_in": _dense(sd, f"{b}.ff.net.0.proj"),
            "proj_out": _dense(sd, f"{b}.ff.net.2"),
        },
    }


def _unet_transformer(sd, p):
    depth = 0
    while f"{p}.transformer_blocks.{depth}.norm1.weight" in sd:
        depth += 1
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _proj_conv(sd, f"{p}.proj_in"),
        "proj_out": _proj_conv(sd, f"{p}.proj_out"),
    }
    blocks = [_unet_transformer_block(sd, f"{p}.transformer_blocks.{i}")
              for i in range(depth)]
    if depth == 1:
        out["block"] = blocks[0]
    else:
        out["blocks"] = blocks
    return out


def convert_unet(sd: Mapping[str, np.ndarray], cfg: UNetConfig = SD15_UNET) -> dict:
    params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_mlp": {
            "fc1": _dense(sd, "time_embedding.linear_1"),
            "fc2": _dense(sd, "time_embedding.linear_2"),
        },
        "down_blocks": [],
        "up_blocks": [],
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for bi in range(len(cfg.block_channels)):
        blk = {"resnets": [], "attentions": []}
        for li in range(cfg.layers_per_block):
            blk["resnets"].append(_unet_resnet(sd, f"down_blocks.{bi}.resnets.{li}"))
            if cfg.down_has_attn[bi]:
                blk["attentions"].append(
                    _unet_transformer(sd, f"down_blocks.{bi}.attentions.{li}"))
        if f"down_blocks.{bi}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")
        params["down_blocks"].append(blk)
    params["mid"] = {
        "resnet1": _unet_resnet(sd, "mid_block.resnets.0"),
        "attention": _unet_transformer(sd, "mid_block.attentions.0"),
        "resnet2": _unet_resnet(sd, "mid_block.resnets.1"),
    }
    if "add_embedding.linear_1.weight" in sd:  # SDXL text_time conditioning
        params["add_embedding"] = {
            "fc1": _dense(sd, "add_embedding.linear_1"),
            "fc2": _dense(sd, "add_embedding.linear_2"),
        }
    for bi in range(len(cfg.block_channels)):
        blk = {"resnets": [], "attentions": []}
        for li in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_unet_resnet(sd, f"up_blocks.{bi}.resnets.{li}"))
            if cfg.up_has_attn[bi]:
                blk["attentions"].append(
                    _unet_transformer(sd, f"up_blocks.{bi}.attentions.{li}"))
        if f"up_blocks.{bi}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv")
        params["up_blocks"].append(blk)
    return params


def export_unet_to_diffusers(params: dict, cfg: UNetConfig = SD15_UNET) -> dict:
    """Inverse of convert_unet (numpy outputs, torch [O,I,...] layouts)."""
    sd: dict[str, np.ndarray] = {}

    def put_conv(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_dense(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T.copy()
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_norm(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_resnet(prefix, p):
        put_norm(f"{prefix}.norm1", p["norm1"])
        put_conv(f"{prefix}.conv1", p["conv1"])
        put_dense(f"{prefix}.time_emb_proj", p["time_emb_proj"])
        put_norm(f"{prefix}.norm2", p["norm2"])
        put_conv(f"{prefix}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(f"{prefix}.conv_shortcut", p["conv_shortcut"])

    def put_attn(prefix, p):
        sd[f"{prefix}.to_q.weight"] = np.asarray(p["q"]["w"]).T.copy()
        sd[f"{prefix}.to_k.weight"] = np.asarray(p["k"]["w"]).T.copy()
        sd[f"{prefix}.to_v.weight"] = np.asarray(p["v"]["w"]).T.copy()
        put_dense(f"{prefix}.to_out.0", p["o"])

    def put_transformer(prefix, p):
        put_norm(f"{prefix}.norm", p["norm"])
        put_conv(f"{prefix}.proj_in", p["proj_in"])
        blocks = p["blocks"] if "blocks" in p else [p["block"]]
        for i, blk in enumerate(blocks):
            b = f"{prefix}.transformer_blocks.{i}"
            put_norm(f"{b}.norm1", blk["norm1"])
            put_attn(f"{b}.attn1", blk["attn1"])
            put_norm(f"{b}.norm2", blk["norm2"])
            put_attn(f"{b}.attn2", blk["attn2"])
            put_norm(f"{b}.norm3", blk["norm3"])
            put_dense(f"{b}.ff.net.0.proj", blk["ff"]["proj_in"])
            put_dense(f"{b}.ff.net.2", blk["ff"]["proj_out"])
        put_conv(f"{prefix}.proj_out", p["proj_out"])

    put_conv("conv_in", params["conv_in"])
    put_dense("time_embedding.linear_1", params["time_mlp"]["fc1"])
    put_dense("time_embedding.linear_2", params["time_mlp"]["fc2"])
    for bi, blk in enumerate(params["down_blocks"]):
        for li, res in enumerate(blk["resnets"]):
            put_resnet(f"down_blocks.{bi}.resnets.{li}", res)
        for li, att in enumerate(blk["attentions"]):
            put_transformer(f"down_blocks.{bi}.attentions.{li}", att)
        if "downsample" in blk:
            put_conv(f"down_blocks.{bi}.downsamplers.0.conv", blk["downsample"])
    put_resnet("mid_block.resnets.0", params["mid"]["resnet1"])
    put_transformer("mid_block.attentions.0", params["mid"]["attention"])
    put_resnet("mid_block.resnets.1", params["mid"]["resnet2"])
    if "add_embedding" in params:
        put_dense("add_embedding.linear_1", params["add_embedding"]["fc1"])
        put_dense("add_embedding.linear_2", params["add_embedding"]["fc2"])
    for bi, blk in enumerate(params["up_blocks"]):
        for li, res in enumerate(blk["resnets"]):
            put_resnet(f"up_blocks.{bi}.resnets.{li}", res)
        for li, att in enumerate(blk["attentions"]):
            put_transformer(f"up_blocks.{bi}.attentions.{li}", att)
        if "upsample" in blk:
            put_conv(f"up_blocks.{bi}.upsamplers.0.conv", blk["upsample"])
    put_norm("conv_norm_out", params["conv_norm_out"])
    put_conv("conv_out", params["conv_out"])
    return sd


# ---------------------------------------------------------------------------
# VAE (LDM naming)
# ---------------------------------------------------------------------------


def _vae_resblock(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_vae_ldm(sd: Mapping[str, np.ndarray], cfg: VAEConfig = SD_VAE) -> dict:
    """CompVis/LDM AutoencoderKL state dict (keys like `encoder.down.0.block.0…`,
    possibly prefixed `first_stage_model.`)."""
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}
    n_levels = len(cfg.ch_mult)
    enc = {"conv_in": _conv(sd, "encoder.conv_in"), "down": []}
    for i in range(n_levels):
        level = {"blocks": [
            _vae_resblock(sd, f"encoder.down.{i}.block.{j}")
            for j in range(cfg.num_res_blocks)
        ]}
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = _conv(sd, f"encoder.down.{i}.downsample.conv")
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": _vae_resblock(sd, "encoder.mid.block_1"),
        "attn_1": _vae_attn(sd, "encoder.mid.attn_1"),
        "block_2": _vae_resblock(sd, "encoder.mid.block_2"),
    }
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "block_1": _vae_resblock(sd, "decoder.mid.block_1"),
            "attn_1": _vae_attn(sd, "decoder.mid.attn_1"),
            "block_2": _vae_resblock(sd, "decoder.mid.block_2"),
        },
        "up": [],
    }
    # CompVis indexes decoder.up by level (0 = highest resolution); execution
    # order (and our storage order) is reversed.
    for i in reversed(range(n_levels)):
        level = {"blocks": [
            _vae_resblock(sd, f"decoder.up.{i}.block.{j}")
            for j in range(cfg.num_res_blocks + 1)
        ]}
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = _conv(sd, f"decoder.up.{i}.upsample.conv")
        dec["up"].append(level)
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_vae_diffusers(sd: Mapping[str, np.ndarray],
                          cfg: VAEConfig = SD_VAE) -> dict:
    """diffusers AutoencoderKL state dict → params (keys
    `encoder.down_blocks.{i}.resnets.{j}…`, attention as to_q/to_k/to_v)."""
    n_levels = len(cfg.ch_mult)

    def resblock(p):
        out = {
            "norm1": _norm(sd, f"{p}.norm1"),
            "conv1": _conv(sd, f"{p}.conv1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "conv2": _conv(sd, f"{p}.conv2"),
        }
        if f"{p}.conv_shortcut.weight" in sd:
            out["nin_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
        return out

    def attn(p):
        # diffusers stores VAE attention as Linear to_q/to_k/to_v/to_out.0;
        # ours are 1x1 convs — reshape [O,I] → [1,1,I,O]
        def lin_as_conv(name):
            w = np.asarray(sd[f"{p}.{name}.weight"])  # [O, I]
            return {
                "w": jnp.asarray(w.T[None, None].copy()),
                "b": jnp.asarray(sd[f"{p}.{name}.bias"]),
            }

        return {
            "norm": _norm(sd, f"{p}.group_norm"),
            "q": lin_as_conv("to_q"),
            "k": lin_as_conv("to_k"),
            "v": lin_as_conv("to_v"),
            "proj_out": lin_as_conv("to_out.0"),
        }

    enc = {"conv_in": _conv(sd, "encoder.conv_in"), "down": []}
    for i in range(n_levels):
        level = {"blocks": [
            resblock(f"encoder.down_blocks.{i}.resnets.{j}")
            for j in range(cfg.num_res_blocks)
        ]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            level["downsample"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": resblock("encoder.mid_block.resnets.0"),
        "attn_1": attn("encoder.mid_block.attentions.0"),
        "block_2": resblock("encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "block_1": resblock("decoder.mid_block.resnets.0"),
            "attn_1": attn("decoder.mid_block.attentions.0"),
            "block_2": resblock("decoder.mid_block.resnets.1"),
        },
        "up": [],
    }
    # diffusers up_blocks are already in execution order
    for i in range(n_levels):
        level = {"blocks": [
            resblock(f"decoder.up_blocks.{i}.resnets.{j}")
            for j in range(cfg.num_res_blocks + 1)
        ]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            level["upsample"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec["up"].append(level)
    dec["norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def apply_ema_weights(sd: Mapping[str, np.ndarray]) -> dict:
    """Substitute `model.diffusion_model.*` weights with their EMA
    shadows. Real single-file SD checkpoints (v1-5-pruned.ckpt) store EMA
    copies flattened as `model_ema.` + the param name with dots removed
    (LitEma naming), e.g. `model.diffusion_model.out.2.bias` →
    `model_ema.diffusion_modelout2bias`. Non-tensor EMA bookkeeping keys
    (`model_ema.decay`, `model_ema.num_updates`) are ignored."""
    out = dict(sd)
    n = 0
    for k in sd:
        if not k.startswith("model.diffusion_model."):
            continue
        ema_key = "model_ema." + k[len("model."):].replace(".", "")
        if ema_key in sd:
            out[k] = sd[ema_key]
            n += 1
    if n == 0:
        raise ValueError("prefer_ema=True but no model_ema.* shadows found")
    return out


def load_sd_towers(path: str, unet_cfg: UNetConfig = SD15_UNET,
                   vae_cfg: VAEConfig = SD_VAE,
                   prefer_ema: bool = False,
                   cast_fp32: bool = True) -> dict:
    """Load an SD1.5 checkpoint from disk and convert every tower present.

    Accepts the LDM single-file layout (`v1-5-pruned.ckpt` /
    `sd15-dste8-vae.safetensors` — the format the reference's
    `scripts/ckpt_lib.py` surgeries operate on and
    `load_model_from_config` consumes, `ldm/util.py:130`) or a bare
    diffusers UNet state dict. Returns a dict with whichever of
    `unet` / `vae` / `text_encoder` (+ `text_cfg`) the file contains.

    prefer_ema substitutes the UNet weights with their `model_ema.*`
    shadows (the reference loads non-EMA; the pruned-emaonly releases
    ship only EMA). cast_fp32 upcasts fp16 checkpoints (e.g. the fp16
    840k-MSE VAE) so the params match the training dtype convention.
    """
    from adaface_tpu.tools.ckpt_lib import extract_subtree, load_state_dict
    from adaface_tpu.tools.convert_clip import convert_text_model
    from adaface_tpu.tools.convert_ldm_unet import convert_ldm_unet

    sd = load_state_dict(path)
    # drop non-array bookkeeping entries (model_ema.decay / num_updates,
    # LDM schedule buffers are 0-d or 1-d floats and simply never matched)
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}
    if prefer_ema:
        sd = apply_ema_weights(sd)
    out: dict = {}
    if any(k.startswith("model.diffusion_model.") for k in sd):
        out["unet"] = convert_ldm_unet(sd, unet_cfg)
        if any(k.startswith("first_stage_model.") for k in sd):
            out["vae"] = convert_vae_ldm(
                extract_subtree(sd, "first_stage_model."), vae_cfg)
        if any(k.startswith("cond_stage_model.transformer.") for k in sd):
            te = extract_subtree(sd, "cond_stage_model.transformer.")
            out["text_encoder"], out["text_cfg"] = convert_text_model(te)
    else:
        out["unet"] = convert_unet(sd, unet_cfg)
    if cast_fp32:
        import jax

        out = {k: (jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, v) if k != "text_cfg" else v)
            for k, v in out.items()}
    return out
