"""Shared CLI helpers: build the inference wrapper from checkpoint paths
(or random weights for smoke runs) and load subject images."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def add_model_args(ap):
    ap.add_argument("--base_model", default=None,
                    help="SD1.5 checkpoint (.safetensors/.ckpt); random "
                         "weights if omitted")
    ap.add_argument("--adaface_ckpt", default=None,
                    help="adaface checkpoint dir (orbax)")
    ap.add_argument("--encoder", default="arc2face",
                    choices=["arc2face", "consistentID", "jointIDs"])
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--num_inference_steps", type=int, default=50)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--pipeline", default=None,
                    choices=["text2img", "img2img", "text2imgxl",
                             "text2img3"],
                    help="pipeline family (`adaface_infer.py:43`); the "
                         "CLI's own default is used when omitted")


def build_wrapper(args, pipeline_name: str = "text2img"):
    from adaface_tpu.id2ada.face_id_to_ada_prompt import create_id2ada_prompt_encoder
    from adaface_tpu.inference.pipeline import PipelineModules
    from adaface_tpu.inference.wrapper import AdaFaceWrapper

    if getattr(args, "pipeline", None):
        pipeline_name = args.pipeline
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if pipeline_name == "text2imgxl":
            from adaface_tpu.inference.sdxl_pipeline import SDXLPipelineModules

            modules = SDXLPipelineModules.random_init(
                jax.random.PRNGKey(0), dtype=dtype)
            tower_names = ("unet", "vae", "text_encoder", "text_encoder_2")
        elif pipeline_name == "text2img3":
            from adaface_tpu.inference.sd3_pipeline import SD3PipelineModules

            modules = SD3PipelineModules.random_init(
                jax.random.PRNGKey(0), dtype=dtype)
            tower_names = ("mmdit", "vae", "text_encoder", "text_encoder_2")
        else:
            modules = PipelineModules.random_init(
                jax.random.PRNGKey(0), dtype=dtype)
            tower_names = ("unet", "vae", "text_encoder")
        if args.base_model:
            if pipeline_name in ("text2imgxl", "text2img3"):
                raise SystemExit(
                    f"--base_model single-file loading for {pipeline_name} "
                    "isn't wired into this CLI yet — convert the towers "
                    "with tools/convert_sd.py (SDXL UNet/VAE), "
                    "tools/convert_mmdit.py (SD3) and "
                    "tools/convert_clip.py, then assemble the pipeline "
                    "modules in python")
            _load_base_model(modules, args.base_model)
        encoder = create_id2ada_prompt_encoder(
            args.encoder, jax.random.PRNGKey(1))
    dev = jax.devices()[0]
    for name in tower_names:
        setattr(modules, name, jax.device_put(getattr(modules, name), dev))

    if args.adaface_ckpt:
        _load_adaface(encoder, args.adaface_ckpt)

    return AdaFaceWrapper(
        pipeline_name, modules, encoder,
        guidance_scale=args.guidance_scale,
        num_inference_steps=args.num_inference_steps, dtype=dtype)


def _load_base_model(modules, path: str):
    from adaface_tpu.tools.convert_sd import load_sd_towers

    towers = load_sd_towers(path)
    for name in ("unet", "vae", "text_encoder", "text_cfg"):
        if name in towers:
            setattr(modules, name, towers[name])
    print(f"loaded base model weights from {path}: {sorted(towers)}")


def _load_adaface(encoder, ckpt_dir: str):
    from adaface_tpu.train.checkpoint import load_adaface_ckpt

    state, manifest = load_adaface_ckpt(ckpt_dir)
    sbgs = state.get("subj_basis_generators", {})
    encoders = getattr(encoder, "encoders", [encoder])
    for enc in encoders:
        for key in (enc.name, "joint"):
            if key in sbgs:
                enc.subj_basis_generator["params"] = sbgs[key]
                print(f"loaded SBG params for {enc.name} from {ckpt_dir}")
                break


def load_subject_images(path: str, limit: int | None = None):
    from PIL import Image

    exts = {".jpg", ".jpeg", ".png", ".webp", ".bmp"}
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if os.path.splitext(f)[1].lower() in exts)
    else:
        files = [path]
    if limit:
        files = files[:limit]
    return [np.asarray(Image.open(f).convert("RGB")) for f in files]


def save_image_grid(images, out_path: str, cols: int = 2):
    """[N,3,H,W] float in [0,1] → grid PNG."""
    from PIL import Image

    arr = (np.asarray(images) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
    n, h, w, _ = arr.shape
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(arr):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    Image.fromarray(grid).save(out_path)
    return out_path


def save_images(images, out_dir: str, prefix: str = "sample"):
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    arr = (np.asarray(images) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
    paths = []
    for i, im in enumerate(arr):
        p = os.path.join(out_dir, f"{prefix}_{i:03d}.png")
        Image.fromarray(im).save(p)
        paths.append(p)
    return paths
