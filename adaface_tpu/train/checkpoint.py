"""Structured checkpointing (replaces the reference's pickled nn.Modules).

The reference saves `embeddings_gs-{step}.pt` containing whole pickled
torch modules + a LoRA state dict every 500 steps
(`CustomCheckpointSaver` → `EmbeddingManager.save`,
`ldm/modules/embedding_manager.py:513-662`, SURVEY §5). Here checkpoints
are versioned Orbax state-dict saves with a JSON manifest:

    ckpt_dir/
      manifest.json          # version, step, configs, MKV multipliers
      state/                 # orbax pytree: trainable params (+ optimizer)

Load-time compatibility mirrors the reference's patch-up logic: if the
checkpoint's prompt2token_proj MKV multipliers differ from the requested
ones, the attention is re-extended/squeezed on load
(`face_id_to_ada_prompt.py:109-162`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_VERSION = 1


def save_checkpoint(
    ckpt_dir: str,
    state: Any,  # pytree (e.g. train_step.State or raw params)
    step: int,
    manifest_extra: dict | None = None,
):
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    manifest = {"version": CKPT_VERSION, "step": int(step)}
    if manifest_extra:
        manifest.update(manifest_extra)
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(ckpt_dir, "state")
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return ckpt_dir


def load_checkpoint(ckpt_dir: str, target: Any | None = None):
    """→ (state, manifest). With `target`, restores into its structure."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(ckpt_dir, "state")
    if target is not None:
        state = ckptr.restore(path, target)
    else:
        # No target: restore to host numpy instead of the shardings recorded
        # at save time — those reference devices (e.g. TFRT_CPU_0) that may
        # not exist on the loading platform (e.g. a TPU process).
        meta = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        with ocp.PyTreeCheckpointer() as ptc:
            state = ptc.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    return state, manifest


def save_adaface_ckpt(
    ckpt_dir: str,
    step: int,
    sbg_params_by_encoder: dict[str, Any],
    unet_lora_params: Any | None = None,
    mkv_multipliers: dict[str, list[int]] | None = None,
):
    """Save the trainable AdaFace state (SubjBasisGenerators + UNet LoRAs),
    the equivalent of `embeddings_gs-{step}.pt`."""
    state = {"subj_basis_generators": sbg_params_by_encoder}
    if unet_lora_params is not None:
        state["unet_lora_modules"] = unet_lora_params
    return save_checkpoint(
        ckpt_dir, state, step,
        manifest_extra={
            "kind": "adaface",
            "mkv_multipliers": mkv_multipliers or {},
        },
    )


def load_adaface_ckpt(
    ckpt_dir: str,
    target: Any | None = None,
    want_mkv_multipliers: dict[str, list[int]] | None = None,
    rng: jax.Array | None = None,
):
    """Load + patch-up: re-extend MKV attention when the requested
    multipliers exceed the saved ones (`load_adaface_ckpt` semantics)."""
    state, manifest = load_checkpoint(ckpt_dir, target)
    if want_mkv_multipliers:
        from adaface_tpu.models.clip import extend_mkv, squeeze_mkv

        saved = manifest.get("mkv_multipliers", {})
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for enc_name, want in want_mkv_multipliers.items():
            have = saved.get(enc_name)
            sbg = state["subj_basis_generators"].get(enc_name)
            if sbg is None or have is None:
                continue
            proj = sbg.get("prompt2token_proj")
            if proj is None:
                continue
            fake = {"layers": proj["layers"]}
            mult = [w // h if h else 1 for w, h in zip(want, have)]
            div = [h // w if w and h > w else 1 for w, h in zip(want, have)]
            if any(m > 1 for m in mult):
                rng, sub = jax.random.split(rng)
                fake = extend_mkv(fake, sub, mult, perturb_std=0.1)
            if any(d > 1 for d in div):
                fake = squeeze_mkv(fake, div)
            proj["layers"] = fake["layers"]
    return state, manifest


def export_reference_ckpt(pt_path: str, out_dir: str, reference_root: str = "/root/reference"):
    """One-way converter for the reference's pickled `embeddings_gs-*.pt`.

    The pickle contains live nn.Modules whose class definitions live in the
    reference repo (SURVEY §7 hard part 7), so this tool temporarily adds it
    to sys.path, unpickles with torch, and exports plain state-dict npz
    files that `adaface_tpu.tools.convert_clip` can map into params.
    """
    import sys

    import torch

    sys.path.insert(0, reference_root)
    try:
        ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    finally:
        sys.path.remove(reference_root)

    os.makedirs(out_dir, exist_ok=True)
    exported = {}
    sbg_dict = ckpt.get("string_to_subj_basis_generator_dict", {})
    for key, module in sbg_dict.items():
        sd = {k: v.detach().float().numpy() for k, v in module.state_dict().items()}
        np.savez(os.path.join(out_dir, f"sbg_{key}.npz"), **sd)
        exported[f"sbg_{key}"] = len(sd)
    if "unet_lora_modules" in ckpt and ckpt["unet_lora_modules"] is not None:
        lora = ckpt["unet_lora_modules"]
        sd = (lora if isinstance(lora, dict)
              else {k: v for k, v in lora.state_dict().items()})
        sd = {k: np.asarray(v.detach().float().numpy()
                            if hasattr(v, "detach") else v)
              for k, v in sd.items()}
        np.savez(os.path.join(out_dir, "unet_lora.npz"), **sd)
        exported["unet_lora"] = len(sd)
    with open(os.path.join(out_dir, "export_info.json"), "w") as f:
        json.dump(exported, f, indent=2)
    return exported
