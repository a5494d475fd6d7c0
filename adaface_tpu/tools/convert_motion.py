"""AnimateDiff motion-module checkpoint → `models/motion.py` pytree.

Maps the public AnimateDiff `mm_sd_v15*.ckpt` state-dict layout (the weights
AdaFace-Animate conditions with ada tokens) onto our temporal modules:

    {down,up}_blocks.{b}.motion_modules.{l}.temporal_transformer.
        norm.{weight,bias}
        proj_in.{weight,bias}
        transformer_blocks.{t}.attention_blocks.{a}.to_{q,k,v}.weight
        transformer_blocks.{t}.attention_blocks.{a}.to_out.0.{weight,bias}
        transformer_blocks.{t}.norms.{a}.{weight,bias}
        transformer_blocks.{t}.ff.net.0.proj.{weight,bias}   (GEGLU)
        transformer_blocks.{t}.ff.net.2.{weight,bias}
        transformer_blocks.{t}.ff_norm.{weight,bias}
        proj_out.{weight,bias}
    mid_block.motion_modules.0....

`pos_encoder.pe` buffers are skipped (we compute the sinusoidal table).
Torch Linear weights [out, in] are transposed to [in, out].
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _ln(sd: Mapping[str, np.ndarray], prefix: str):
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _linear(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True):
    p = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if bias:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _module(sd: Mapping[str, np.ndarray], prefix: str,
            num_layers: int, attns_per_block: int):
    tt = f"{prefix}.temporal_transformer"
    blocks = []
    for t in range(num_layers):
        tb = f"{tt}.transformer_blocks.{t}"
        attns = []
        for a in range(attns_per_block):
            ab = f"{tb}.attention_blocks.{a}"
            attns.append({
                "norm": _ln(sd, f"{tb}.norms.{a}"),
                "q": {"w": jnp.asarray(np.asarray(sd[f"{ab}.to_q.weight"]).T)},
                "k": {"w": jnp.asarray(np.asarray(sd[f"{ab}.to_k.weight"]).T)},
                "v": {"w": jnp.asarray(np.asarray(sd[f"{ab}.to_v.weight"]).T)},
                "o": _linear(sd, f"{ab}.to_out.0"),
            })
        blocks.append({
            "attn": attns,
            "norm_ff": _ln(sd, f"{tb}.ff_norm"),
            "ff": {
                "proj_in": _linear(sd, f"{tb}.ff.net.0.proj"),
                "proj_out": _linear(sd, f"{tb}.ff.net.2"),
            },
        })
    return {
        "norm": _ln(sd, f"{tt}.norm"),
        "proj_in": _linear(sd, f"{tt}.proj_in"),
        "blocks": blocks,
        "proj_out": _linear(sd, f"{tt}.proj_out"),
    }


def convert_motion_modules(
    sd: Mapping[str, np.ndarray],
    num_down_blocks: int = 4,
    layers_per_block: int = 2,
    num_layers: int = 1,
    attns_per_block: int = 2,
):
    """Full AnimateDiff state dict → {"down", "mid", "up"} pytree."""
    out = {"down": [], "mid": None, "up": []}
    for b in range(num_down_blocks):
        out["down"].append([
            _module(sd, f"down_blocks.{b}.motion_modules.{l}",
                    num_layers, attns_per_block)
            for l in range(layers_per_block)
        ])
    out["mid"] = _module(sd, "mid_block.motion_modules.0",
                         num_layers, attns_per_block)
    for b in range(num_down_blocks):
        out["up"].append([
            _module(sd, f"up_blocks.{b}.motion_modules.{l}",
                    num_layers, attns_per_block)
            for l in range(layers_per_block + 1)
        ])
    return out


def load_motion_ckpt(path: str, **kw):
    """Load a `.ckpt`/`.safetensors`/`.npz` AnimateDiff motion checkpoint."""
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    elif path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in obj:
            obj = obj["state_dict"]
        sd = {k: v.numpy() for k, v in obj.items()}
    sd = {k: v for k, v in sd.items() if not k.endswith("pos_encoder.pe")}
    return convert_motion_modules(sd, **kw)
