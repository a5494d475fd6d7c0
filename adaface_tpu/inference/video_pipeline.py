"""Personalized text-to-video pipeline (AdaFace-Animate equivalent).

The reference links the AdaFace-Animate demo (`app.py:307-308`) and ships
video evaluation (`scripts/eval_videos.py`); the generation side lives in a
sibling repo that conditions an AnimateDiff video UNet with ada tokens.
Here the whole path is native: the image SD1.5 UNet plus temporal motion
modules (`models/motion.py`), the ada-token text encoder, and the DDIM CFG
loop compile into one XLA program; frames ride the batch axis so every
matmul stays MXU-shaped.

Latents are [V·F, 4, h, w] with frames contiguous per video; the text
context is broadcast per frame, so classifier-free guidance batches
[uncond; cond] exactly as the image pipeline does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules
from adaface_tpu.models.motion import MM_SD15_V2, MotionConfig
from adaface_tpu.models.unet import AttnRuntime, unet_apply
from adaface_tpu.ops.samplers import DDIMConfig, ddim_sample


class VideoPipeline(DiffusionPipeline):
    """DiffusionPipeline + motion modules → video clips.

    `motion` is the temporal-module pytree (`init_motion_params` or the
    AnimateDiff converter in `tools/convert_motion.py`).
    """

    def __init__(self, modules: PipelineModules, motion,
                 motion_cfg: MotionConfig = MM_SD15_V2,
                 dtype=jnp.bfloat16):
        super().__init__(modules, dtype=dtype)
        self.motion = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, motion)
        self.motion_cfg = motion_cfg
        self._video_generate = None
        self._video_key = None

    # ------------------------------------------------------------------
    def _build_video_generate(self, ddim_cfg: DDIMConfig, num_frames: int):
        schedule = self.m.schedule
        unet_cfg = self.m.unet_cfg

        motion_cfg = self.motion_cfg

        @jax.jit
        def generate(unet_params, motion, cond, uncond, x_T, rng):
            def model_fn(x, t, ctx):
                eps, _ = unet_apply(
                    unet_params, x, t, ctx, unet_cfg,
                    rt=AttnRuntime(), motion=motion, num_frames=num_frames,
                    motion_cfg=motion_cfg)
                return eps

            return ddim_sample(model_fn, schedule, x_T,
                               cond_ctx=cond, uncond_ctx=uncond,
                               cfg=ddim_cfg, rng=rng)

        return generate

    def __call__(  # type: ignore[override]
        self,
        prompts: str | list[str],
        negative_prompt: str = "",
        num_frames: int = 16,
        num_inference_steps: int = 25,
        guidance_scale: float = 7.5,
        height: int = 512,
        width: int = 512,
        rng: jax.Array | None = None,
        latents: jax.Array | None = None,
        return_latents: bool = False,
        decode_chunk: int = 8,
    ):
        """→ frames [V, F, 3, H, W] in [0, 1]."""
        if isinstance(prompts, str):
            prompts = [prompts]
        v = len(prompts)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_lat, k_samp = jax.random.split(rng)
        s = self.m.vae_cfg.spatial_scale
        if latents is None:
            latents = jax.random.normal(
                k_lat, (v * num_frames, 4, height // s, width // s),
                self.dtype)

        max_len = self.m.text_encoder["position_embedding"].shape[0]
        cond, uncond = self.encode_prompt(
            prompts, [negative_prompt] * v if guidance_scale > 1 else None,
            max_length=max_len)
        # broadcast text context over frames (frames contiguous per video)
        cond = jnp.repeat(cond, num_frames, axis=0)
        if uncond is not None:
            uncond = jnp.repeat(uncond, num_frames, axis=0)

        ddim_cfg = DDIMConfig(num_inference_steps=num_inference_steps,
                              guidance_scale=guidance_scale)
        key = (num_inference_steps, guidance_scale, num_frames)
        if self._video_generate is None or self._video_key != key:
            self._video_generate = self._build_video_generate(
                ddim_cfg, num_frames)
            self._video_key = key
        z0 = self._video_generate(self.m.unet, self.motion, cond, uncond,
                                  latents, k_samp)
        if return_latents:
            return z0.reshape(v, num_frames, *z0.shape[1:])

        # chunked decode keeps the decoder's peak HBM at decode_chunk frames
        frames = [self._decode(self.m.vae, z0[i:i + decode_chunk])
                  for i in range(0, z0.shape[0], decode_chunk)]
        img = jnp.concatenate(frames, axis=0)
        img = (img.astype(jnp.float32) + 1.0) / 2.0
        img = jnp.clip(img, 0.0, 1.0)
        return img.reshape(v, num_frames, *img.shape[1:])

    def to_gif(self, video: jax.Array, path: str, fps: int = 8):
        """Save one clip [F, 3, H, W] as an animated GIF."""
        from PIL import Image

        arr = (np.asarray(video) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
        ims = [Image.fromarray(a) for a in arr]
        ims[0].save(path, save_all=True, append_images=ims[1:],
                    duration=int(1000 / fps), loop=0)
        return path
