"""Convert HF transformers CLIP checkpoints to adaface_tpu param pytrees.

Works on any mapping of parameter-name → numpy array (torch
`state_dict` converted with `.numpy()`, or safetensors). The SD1.5 text
encoder, the Arc2Face-finetuned text encoder (`adaface/arc2face_models.py:
21-29`), the OpenAI CLIP-L and laion CLIP-H vision towers all use these key
layouts. Linear weights are transposed torch [out,in] → ours [in,out].

Also understands MKV-extended checkpoints: a k/v projection whose out-dim is
a multiple of hidden_size converts as-is (the multiplier is implicit in the
shape), so `extract_subj_basis_generator`-style squeezed/extended reference
ckpts round-trip.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig


def _ln(sd: Mapping[str, np.ndarray], prefix: str):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _linear(sd: Mapping[str, np.ndarray], prefix: str):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T.copy()),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _encoder_layer(sd, prefix: str):
    return {
        "ln1": _ln(sd, f"{prefix}.layer_norm1"),
        "attn": {
            "q": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "k": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "v": _linear(sd, f"{prefix}.self_attn.v_proj"),
            "o": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "ln2": _ln(sd, f"{prefix}.layer_norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def _num_layers(sd, stem: str) -> int:
    n = 0
    while f"{stem}.layers.{n}.layer_norm1.weight" in sd:
        n += 1
    return n


def convert_text_model(
    sd: Mapping[str, np.ndarray], prefix: str = "text_model.",
    num_heads: int | None = None,
    hidden_act: str = "quick_gelu",
) -> tuple[dict, CLIPTextConfig]:
    """HF CLIPTextModel state dict → (params, config). num_heads can't be
    recovered from weight shapes; defaults to head_dim 64 (every shipped
    CLIP text tower) — pass explicitly for nonstandard models. A top-level
    `text_projection.weight` (CLIPTextModelWithProjection, e.g. SDXL's
    bigG tower — pass hidden_act="gelu" for laion models) is carried into
    the params as the bias-free pooled projection."""
    tok = np.asarray(sd[f"{prefix}embeddings.token_embedding.weight"])
    pos = np.asarray(sd[f"{prefix}embeddings.position_embedding.weight"])
    stem = f"{prefix}encoder"
    n_layers = _num_layers(sd, stem)
    d = tok.shape[1]
    fc1 = np.asarray(sd[f"{stem}.layers.0.mlp.fc1.weight"])
    q0 = np.asarray(sd[f"{stem}.layers.0.self_attn.q_proj.weight"])
    proj = None
    for key in ("text_projection.weight", f"{prefix}text_projection.weight"):
        if key in sd:
            proj = np.asarray(sd[key])
            break
    cfg = CLIPTextConfig(
        vocab_size=tok.shape[0],
        hidden_size=d,
        num_layers=n_layers,
        num_heads=num_heads if num_heads is not None else max(d // 64, 1),
        intermediate_size=fc1.shape[0],
        max_position_embeddings=pos.shape[0],
        hidden_act=hidden_act,
        projection_dim=None if proj is None else proj.shape[0],
    )
    params = {
        "token_embedding": jnp.asarray(tok),
        "position_embedding": jnp.asarray(pos),
        "layers": [
            _encoder_layer(sd, f"{stem}.layers.{i}") for i in range(n_layers)
        ],
        "final_ln": _ln(sd, f"{prefix}final_layer_norm"),
    }
    if proj is not None:
        params["text_projection"] = {"w": jnp.asarray(proj.T.copy())}
    return params, cfg


def convert_vision_model(
    sd: Mapping[str, np.ndarray], prefix: str = "vision_model.",
    num_heads: int | None = None,
) -> tuple[dict, CLIPVisionConfig]:
    """HF CLIPVisionModel state dict → (params, config). num_heads can't
    be recovered from weight shapes; defaults cover the shipped CLIP
    vision towers (head_dim 80 for ViT-H/1280, else 64)."""
    patch = np.asarray(sd[f"{prefix}embeddings.patch_embedding.weight"])
    pos = np.asarray(sd[f"{prefix}embeddings.position_embedding.weight"])
    stem = f"{prefix}encoder"
    n_layers = _num_layers(sd, stem)
    d = patch.shape[0]
    fc1 = np.asarray(sd[f"{stem}.layers.0.mlp.fc1.weight"])
    n_patches = pos.shape[0] - 1
    patch_size = patch.shape[-1]
    cfg = CLIPVisionConfig(
        hidden_size=d,
        num_layers=n_layers,
        num_heads=num_heads if num_heads is not None
        else (d // 80 if d in (1280,) else max(d // 64, 1)),
        intermediate_size=fc1.shape[0],
        image_size=int(np.sqrt(n_patches)) * patch_size,
        patch_size=patch_size,
        projection_dim=(
            np.asarray(sd["visual_projection.weight"]).shape[0]
            if "visual_projection.weight" in sd
            else None
        ),
    )
    params = {
        "class_embedding": jnp.asarray(sd[f"{prefix}embeddings.class_embedding"]),
        "patch_embedding": jnp.asarray(patch),
        "position_embedding": jnp.asarray(pos),
        "pre_ln": _ln(sd, f"{prefix}pre_layrnorm"),  # HF's historical typo
        "layers": [
            _encoder_layer(sd, f"{stem}.layers.{i}") for i in range(n_layers)
        ],
        "post_ln": _ln(sd, f"{prefix}post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        w = np.asarray(sd["visual_projection.weight"]).T.copy()
        b = sd.get("visual_projection.bias")
        params["visual_projection"] = {
            "w": jnp.asarray(w),
            "b": jnp.asarray(b) if b is not None else jnp.zeros((w.shape[1],)),
        }
    return params, cfg


def torch_state_dict_to_numpy(module) -> dict[str, np.ndarray]:
    """torch nn.Module → {name: float32 numpy} (host-side, no torch deps here
    beyond duck-typing)."""
    return {
        k: v.detach().to("cpu").float().numpy() for k, v in module.state_dict().items()
    }
