"""LDM (CompVis) UNet state-dict → diffusers naming → our params.

Completes single-file checkpoint loading (`v1-5-pruned.ckpt`-style files,
the format AdaFaceWrapper consumes via `from_single_file`,
`adaface_wrapper.py:234`): `model.diffusion_model.*` keys are renamed to
the diffusers `UNet2DConditionModel` layout, then converted by
`convert_sd.convert_unet`.

The mapping follows the standard SD1.5 topology: per down block i,
input_blocks[3i+1, 3i+2] hold (resnet, attention) pairs and
input_blocks[3i+3] the downsampler; output_blocks mirror this with
3 resnets per block and the upsampler attached to the last entry.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from adaface_tpu.models.unet import SD15_UNET, UNetConfig
from adaface_tpu.tools.convert_sd import convert_unet

RESNET_MAP = [
    ("in_layers.0", "norm1"),
    ("in_layers.2", "conv1"),
    ("emb_layers.1", "time_emb_proj"),
    ("out_layers.0", "norm2"),
    ("out_layers.3", "conv2"),
    ("skip_connection", "conv_shortcut"),
]

def _attn_map(depth: int = 1) -> list[tuple[str, str]]:
    """Spatial-transformer key pairs for `depth` stacked transformer
    blocks (SDXL levels use depth 2/10; LDM and diffusers use the same
    inner names, so the map is the identity on the block subtree)."""
    pairs = [("norm", "norm"), ("proj_in", "proj_in"),
             ("proj_out", "proj_out")]
    for d in range(depth):
        for inner in (
                "norm1", "attn1.to_q", "attn1.to_k", "attn1.to_v",
                "attn1.to_out.0", "norm2", "attn2.to_q", "attn2.to_k",
                "attn2.to_v", "attn2.to_out.0", "norm3", "ff.net.0.proj",
                "ff.net.2"):
            key = f"transformer_blocks.{d}.{inner}"
            pairs.append((key, key))
    return pairs


ATTN_MAP = _attn_map(1)


def ldm_unet_to_diffusers_keys(
    sd: Mapping[str, np.ndarray], cfg: UNetConfig = SD15_UNET
) -> dict[str, np.ndarray]:
    """`model.diffusion_model.*` keys → diffusers UNet keys."""
    pre = "model.diffusion_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    src = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}
    out: dict[str, np.ndarray] = {}

    def copy(ldm_key, df_key):
        for suf in (".weight", ".bias"):
            if ldm_key + suf in src:
                out[df_key + suf] = src[ldm_key + suf]

    copy("time_embed.0", "time_embedding.linear_1")
    copy("time_embed.2", "time_embedding.linear_2")
    # SDXL (SGM) text_time conditioning MLP
    copy("label_emb.0.0", "add_embedding.linear_1")
    copy("label_emb.0.2", "add_embedding.linear_2")
    copy("input_blocks.0.0", "conv_in")
    copy("out.0", "conv_norm_out")
    copy("out.2", "conv_out")

    n_blocks = len(cfg.block_channels)
    lpb = cfg.layers_per_block

    def block_attn_map(bi: int) -> list[tuple[str, str]]:
        td = cfg.transformer_depth
        return _attn_map(td[bi] if bi < len(td) else 1)

    # down path: input_blocks index 1.. ; each block: lpb (resnet[, attn])
    # entries then a downsampler entry
    idx = 1
    for bi in range(n_blocks):
        for li in range(lpb):
            for ls, ds in RESNET_MAP:
                copy(f"input_blocks.{idx}.0.{ls}",
                     f"down_blocks.{bi}.resnets.{li}.{ds}")
            if cfg.down_has_attn[bi]:
                for ls, ds in block_attn_map(bi):
                    copy(f"input_blocks.{idx}.1.{ls}",
                         f"down_blocks.{bi}.attentions.{li}.{ds}")
            idx += 1
        if bi < n_blocks - 1:
            copy(f"input_blocks.{idx}.0.op",
                 f"down_blocks.{bi}.downsamplers.0.conv")
            idx += 1

    # mid
    for ls, ds in RESNET_MAP:
        copy(f"middle_block.0.{ls}", f"mid_block.resnets.0.{ds}")
        copy(f"middle_block.2.{ls}", f"mid_block.resnets.1.{ds}")
    for ls, ds in _attn_map(cfg.mid_transformer_depth):
        copy(f"middle_block.1.{ls}", f"mid_block.attentions.0.{ds}")

    # up path: output_blocks, lpb+1 entries per block; upsampler appended
    # to the last entry of each non-final block (up blocks mirror the down
    # path, so up block bi uses the REVERSED depth list)
    idx = 0
    for bi in range(n_blocks):
        for li in range(lpb + 1):
            for ls, ds in RESNET_MAP:
                copy(f"output_blocks.{idx}.0.{ls}",
                     f"up_blocks.{bi}.resnets.{li}.{ds}")
            if cfg.up_has_attn[bi]:
                for ls, ds in block_attn_map(n_blocks - 1 - bi):
                    copy(f"output_blocks.{idx}.1.{ls}",
                         f"up_blocks.{bi}.attentions.{li}.{ds}")
            # the upsampler lives in the last sub-module of the last entry
            if li == lpb and bi < n_blocks - 1:
                sub = 2 if cfg.up_has_attn[bi] else 1
                copy(f"output_blocks.{idx}.{sub}.conv",
                     f"up_blocks.{bi}.upsamplers.0.conv")
            idx += 1
    return out


def convert_ldm_unet(sd: Mapping[str, np.ndarray],
                     cfg: UNetConfig = SD15_UNET) -> dict:
    """LDM single-file state dict → our UNet params."""
    return convert_unet(ldm_unet_to_diffusers_keys(sd, cfg), cfg)
