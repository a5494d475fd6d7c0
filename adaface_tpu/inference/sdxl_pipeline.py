"""Text→image SDXL pipeline, fully jitted.

TPU-native counterpart of the diffusers `StableDiffusionXLPipeline` branch
of the reference's AdaFaceWrapper (`adaface/adaface_wrapper.py:126,585-607`,
pipeline_name="text2imgxl"): dual CLIP text encoders (CLIP-L + OpenCLIP
bigG) whose penultimate hidden states concatenate into the 2048-d UNet
context, the bigG projected eos pooling as the added text embedding,
micro-conditioning time_ids, and the SDXL pipeline's default Euler
discrete sampler (the reference skips its DDIM swap for SDXL,
`adaface_wrapper.py:234`).

Ada placeholders live only in encoder 1 — the reference extends one
tokenizer/text-encoder pair and passes `prompt_2 = plain_prompt`
(`adaface_wrapper.py:586`), so personalization flows through the CLIP-L
branch while bigG sees the plain prompt.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models import clip as clip_mod
from adaface_tpu.models.unet import SDXL_UNET, UNetConfig, unet_apply
from adaface_tpu.models.vae import SD_VAE, VAEConfig, vae_decode
from adaface_tpu.ops.samplers import DDIMConfig, ddim_sample, euler_sample
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer

Params = dict[str, Any]

SDXL_LATENT_SCALE = 0.13025  # SDXL VAE scaling_factor


@dataclasses.dataclass
class SDXLPipelineModules:
    unet: Params
    vae: Params
    text_encoder: Params  # CLIP-L (placeholder-extended for ada tokens)
    text_encoder_2: Params  # OpenCLIP bigG with text_projection
    tokenizer: CLIPTokenizer
    unet_cfg: UNetConfig = SDXL_UNET
    vae_cfg: VAEConfig = SD_VAE  # same topology; SDXL differs in weights+scale
    text_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_L_TEXT
    text2_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_BIGG_TEXT
    schedule: DiffusionSchedule | None = None
    latent_scale: float = SDXL_LATENT_SCALE
    # SDXL-base: empty negative prompt conditions on zeros rather than the
    # encoded "" (force_zeros_for_empty_prompt=true in the model config)
    force_zeros_for_empty_prompt: bool = True

    def __post_init__(self):
        if self.schedule is None:
            self.schedule = DiffusionSchedule.create()

    @classmethod
    def random_init(cls, rng: jax.Array, dtype=jnp.bfloat16,
                    unet_cfg: UNetConfig = SDXL_UNET,
                    vae_cfg: VAEConfig = SD_VAE,
                    text_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_L_TEXT,
                    text2_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_BIGG_TEXT):
        from adaface_tpu.models.unet import init_unet_params
        from adaface_tpu.models.vae import init_vae_params

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        return cls(
            unet=cast(init_unet_params(k1, unet_cfg)),
            vae=cast(init_vae_params(k2, vae_cfg)),
            text_encoder=cast(clip_mod.init_text_params(k3, text_cfg)),
            text_encoder_2=cast(clip_mod.init_text_params(k4, text2_cfg)),
            tokenizer=default_tokenizer(),
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, text_cfg=text_cfg,
            text2_cfg=text2_cfg,
        )


class SDXLPipeline:
    def __init__(self, modules: SDXLPipelineModules, dtype=jnp.bfloat16):
        self.m = modules
        self.dtype = dtype
        self._generate = None
        self._gen_key = None
        self._decode = jax.jit(
            lambda vae, z: vae_decode(vae, z, self.m.vae_cfg,
                                      scale=self.m.latent_scale))

    # ---------------------------------------------------------------- text
    def _ids2(self, prompts: list[str]) -> jax.Array:
        """tokenizer_2 ids: same BPE, zero-padded after the first eos (the
        SDXL second tokenizer pads with token 0, affecting post-eos hidden
        states that feed the UNet context)."""
        from adaface_tpu.text.tokenizer import zero_pad_after_eos

        ids = self.m.tokenizer(prompts, max_length=77)
        return jnp.asarray(
            zero_pad_after_eos(ids, self.m.tokenizer.eos_token_id))

    def _encode_one(self, prompts: list[str], prompts_2: list[str]):
        """→ (context [B,77,768+1280], pooled [B,1280])."""
        ids1 = jnp.asarray(self.m.tokenizer(prompts, max_length=77))
        out1 = clip_mod.text_encode(
            self.m.text_encoder, ids1, self.m.text_cfg,
            return_hidden_states=True)
        h1 = out1["hidden_states"][-2]  # penultimate, no final LN

        ids2 = self._ids2(prompts_2)
        out2 = clip_mod.text_encode(
            self.m.text_encoder_2, ids2, self.m.text2_cfg,
            return_hidden_states=True, return_pooled=True)
        h2 = out2["hidden_states"][-2]
        pooled = out2["pooled_proj"]
        ctx = jnp.concatenate([h1, h2], axis=-1).astype(self.dtype)
        return ctx, pooled.astype(self.dtype)

    def encode_prompt(
        self,
        prompts: list[str],
        prompts_2: list[str] | None = None,
        negative_prompts: list[str] | None = None,
    ):
        """→ (cond_ctx, pooled, uncond_ctx|None, neg_pooled|None)."""
        if prompts_2 is None:
            prompts_2 = prompts
        cond, pooled = self._encode_one(prompts, prompts_2)
        uncond = neg_pooled = None
        if negative_prompts is not None:
            if (self.m.force_zeros_for_empty_prompt
                    and all(p == "" for p in negative_prompts)):
                uncond = jnp.zeros_like(cond)
                neg_pooled = jnp.zeros_like(pooled)
            else:
                uncond, neg_pooled = self._encode_one(
                    negative_prompts, negative_prompts)
        return cond, pooled, uncond, neg_pooled

    # ------------------------------------------------------------ sampling
    def _build_generate(self, cfg: DDIMConfig, scheduler: str):
        schedule = self.m.schedule
        ucfg = self.m.unet_cfg

        @jax.jit
        def generate(unet_params, ctx_all, x_T):
            cond, pooled, uncond, neg_pooled, time_ids = ctx_all

            def model_fn(x, t, both):
                emb, pool = both["ctx"], both["pooled"]
                added = {"text_embeds": pool,
                         "time_ids": jnp.tile(time_ids, (x.shape[0], 1))}
                eps, _ = unet_apply(unet_params, x, t, emb, ucfg,
                                    added_cond=added)
                return eps

            cond_ctx = {"ctx": cond, "pooled": pooled}
            uncond_ctx = (None if uncond is None
                          else {"ctx": uncond, "pooled": neg_pooled})
            sampler = euler_sample if scheduler == "euler" else ddim_sample
            return sampler(model_fn, schedule, x_T, cond_ctx, uncond_ctx,
                           cfg=cfg)

        return generate

    def __call__(
        self,
        prompts: str | list[str],
        prompts_2: str | list[str] | None = None,
        negative_prompt: str = "",
        num_inference_steps: int = 25,
        guidance_scale: float = 5.0,
        height: int = 1024,
        width: int = 1024,
        rng: jax.Array | None = None,
        latents: jax.Array | None = None,
        return_latents: bool = False,
        scheduler: str = "euler",  # euler (SDXL default) | ddim
    ):
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(prompts_2, str):
            prompts_2 = [prompts_2]
        b = len(prompts)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_lat, _ = jax.random.split(rng)
        if latents is None:
            s = self.m.vae_cfg.spatial_scale
            latents = jax.random.normal(
                k_lat, (b, 4, height // s, width // s), self.dtype)

        cond, pooled, uncond, neg_pooled = self.encode_prompt(
            prompts, prompts_2,
            [negative_prompt] * b if guidance_scale > 1 else None)

        # SDXL micro-conditioning: (orig_h, orig_w, crop_t, crop_l, tgt_h,
        # tgt_w); the text2img path uses the output size with zero crop
        time_ids = jnp.asarray(
            [[height, width, 0, 0, height, width]], jnp.float32)

        cfg = DDIMConfig(num_inference_steps=num_inference_steps,
                         guidance_scale=guidance_scale)
        key = (num_inference_steps, guidance_scale, scheduler)
        if self._generate is None or self._gen_key != key:
            self._generate = self._build_generate(cfg, scheduler)
            self._gen_key = key
        z0 = self._generate(self.m.unet,
                            (cond, pooled, uncond, neg_pooled, time_ids),
                            latents)
        if return_latents:
            return z0
        img = self._decode(self.m.vae, z0)
        img = (img.astype(jnp.float32) + 1.0) / 2.0
        return jnp.clip(img, 0.0, 1.0)

    def to_pil(self, images: jax.Array):
        from PIL import Image

        arr = (np.asarray(images) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
        return [Image.fromarray(a) for a in arr]
