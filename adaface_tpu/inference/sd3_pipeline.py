"""Text→image Stable Diffusion 3 pipeline (MMDiT), fully jitted.

TPU-native counterpart of the diffusers `StableDiffusion3Pipeline` branch
of the reference's AdaFaceWrapper (`adaface/adaface_wrapper.py:128,601-607`,
pipeline_name="text2img3"): dual CLIP text encoders (CLIP-L + bigG, both
with projected eos poolings) whose penultimate hidden states concatenate
and zero-pad to the 4096-d joint context, an optional T5 segment (zeros
when no T5 tower is loaded — matching diffusers' text_encoder_3=None
path), the MMDiT velocity model (`models/mmdit.py`), and rectified-flow
Euler sampling.

Ada placeholders live only in encoder 1; the reference passes
`prompt_2 = plain_prompt` and `prompt_t5 = prompt + ", "*256`
(`adaface_wrapper.py:586-590`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models import clip as clip_mod
from adaface_tpu.models.mmdit import SD3_MEDIUM, MMDiTConfig, mmdit_apply
from adaface_tpu.models.vae import VAEConfig, vae_decode
from adaface_tpu.ops.samplers import rectified_flow_sample
from adaface_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer

Params = dict[str, Any]

SD3_LATENT_SCALE = 1.5305
SD3_LATENT_SHIFT = 0.0609
# SD3 VAE: 16 latent channels, same conv topology otherwise
SD3_VAE = VAEConfig(z_channels=16)


@dataclasses.dataclass
class SD3PipelineModules:
    mmdit: Params
    vae: Params
    text_encoder: Params  # CLIP-L w/ projection (placeholder-extended)
    text_encoder_2: Params  # bigG w/ projection
    tokenizer: CLIPTokenizer
    mmdit_cfg: MMDiTConfig = SD3_MEDIUM
    vae_cfg: VAEConfig = SD3_VAE
    text_cfg: clip_mod.CLIPTextConfig = dataclasses.field(
        default_factory=lambda: dataclasses.replace(
            clip_mod.CLIP_L_TEXT, projection_dim=768))
    text2_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_BIGG_TEXT
    latent_scale: float = SD3_LATENT_SCALE
    latent_shift: float = SD3_LATENT_SHIFT
    t5_len: int = 256  # zero-filled T5 segment length (no T5 tower)

    @classmethod
    def random_init(cls, rng: jax.Array, dtype=jnp.bfloat16,
                    mmdit_cfg: MMDiTConfig = SD3_MEDIUM,
                    vae_cfg: VAEConfig = SD3_VAE,
                    text_cfg: clip_mod.CLIPTextConfig | None = None,
                    text2_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_BIGG_TEXT,
                    t5_len: int = 256):
        from adaface_tpu.models.mmdit import init_mmdit_params
        from adaface_tpu.models.vae import init_vae_params

        if text_cfg is None:
            text_cfg = dataclasses.replace(clip_mod.CLIP_L_TEXT,
                                           projection_dim=768)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        return cls(
            mmdit=cast(init_mmdit_params(k1, mmdit_cfg)),
            vae=cast(init_vae_params(k2, vae_cfg)),
            text_encoder=cast(clip_mod.init_text_params(k3, text_cfg)),
            text_encoder_2=cast(clip_mod.init_text_params(k4, text2_cfg)),
            tokenizer=default_tokenizer(),
            mmdit_cfg=mmdit_cfg, vae_cfg=vae_cfg, text_cfg=text_cfg,
            text2_cfg=text2_cfg, t5_len=t5_len,
        )


class SD3Pipeline:
    def __init__(self, modules: SD3PipelineModules, dtype=jnp.bfloat16):
        self.m = modules
        self.dtype = dtype
        self._generate = None
        self._gen_key = None
        self._decode = jax.jit(
            lambda vae, z: vae_decode(vae, z, self.m.vae_cfg,
                                      scale=self.m.latent_scale,
                                      shift=self.m.latent_shift))

    # ---------------------------------------------------------------- text
    def encode_prompt(
        self,
        prompts: list[str],
        prompts_2: list[str] | None = None,
        t5_embs: jax.Array | None = None,  # [B, t5_len, 4096] if a T5 runs
    ):
        """→ (context [B, 77+t5_len, 4096], pooled [B, 2048])."""
        if prompts_2 is None:
            prompts_2 = prompts
        b = len(prompts)
        d_joint = self.m.mmdit_cfg.context_dim

        ids1 = jnp.asarray(self.m.tokenizer(prompts, max_length=77))
        o1 = clip_mod.text_encode(self.m.text_encoder, ids1, self.m.text_cfg,
                                  return_hidden_states=True,
                                  return_pooled=True)
        # tokenizer_2 is the same OpenCLIP-bigG tokenizer as SDXL's:
        # 0-padding after the first eos (all 77 positions feed the joint
        # context, so the padding convention is load-bearing)
        from adaface_tpu.text.tokenizer import zero_pad_after_eos

        ids2 = jnp.asarray(zero_pad_after_eos(
            self.m.tokenizer(prompts_2, max_length=77),
            self.m.tokenizer.eos_token_id))
        o2 = clip_mod.text_encode(self.m.text_encoder_2, ids2,
                                  self.m.text2_cfg,
                                  return_hidden_states=True,
                                  return_pooled=True)
        clip_ctx = jnp.concatenate(
            [o1["hidden_states"][-2], o2["hidden_states"][-2]], axis=-1)
        pad = d_joint - clip_ctx.shape[-1]
        clip_ctx = jnp.pad(clip_ctx, ((0, 0), (0, 0), (0, pad)))
        if t5_embs is None:
            t5_embs = jnp.zeros((b, self.m.t5_len, d_joint), clip_ctx.dtype)
        ctx = jnp.concatenate([clip_ctx, t5_embs], axis=1)
        p1 = o1.get("pooled_proj", o1["pooled"])
        p2 = o2.get("pooled_proj", o2["pooled"])
        pooled = jnp.concatenate([p1, p2], axis=-1)
        return ctx.astype(self.dtype), pooled.astype(self.dtype)

    # ------------------------------------------------------------ sampling
    def _build_generate(self, steps: int, guidance: float, shift: float):
        cfg = self.m.mmdit_cfg

        @jax.jit
        def generate(params, ctx_all, x_T):
            cond, pooled, uncond, neg_pooled = ctx_all

            def model_fn(x, t, both):
                return mmdit_apply(params, x, t, both["ctx"], both["pooled"],
                                   cfg)

            cond_ctx = {"ctx": cond, "pooled": pooled}
            uncond_ctx = (None if uncond is None
                          else {"ctx": uncond, "pooled": neg_pooled})
            return rectified_flow_sample(
                model_fn, x_T, cond_ctx, uncond_ctx,
                num_inference_steps=steps, guidance_scale=guidance,
                shift=shift)

        return generate

    def __call__(
        self,
        prompts: str | list[str],
        prompts_2: str | list[str] | None = None,
        negative_prompt: str = "",
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        height: int = 1024,
        width: int = 1024,
        rng: jax.Array | None = None,
        latents: jax.Array | None = None,
        return_latents: bool = False,
        sigma_shift: float = 3.0,
        t5_embs: jax.Array | None = None,
        neg_t5_embs: jax.Array | None = None,
    ):
        """Callers providing `t5_embs` (a real T5 run of the prompt)
        should also supply `neg_t5_embs` for the negative prompt — the
        reference encodes the negative prompt through T5 as well, so CFG
        compares two T5-conditioned branches (zeros only when no T5
        tower is loaded at all)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(prompts_2, str):
            prompts_2 = [prompts_2]
        b = len(prompts)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if latents is None:
            s = self.m.vae_cfg.spatial_scale
            latents = jax.random.normal(
                rng, (b, self.m.mmdit_cfg.in_channels,
                      height // s, width // s), self.dtype)

        cond, pooled = self.encode_prompt(prompts, prompts_2, t5_embs)
        uncond = neg_pooled = None
        if guidance_scale > 1:
            uncond, neg_pooled = self.encode_prompt([negative_prompt] * b,
                                                    t5_embs=neg_t5_embs)

        key = (num_inference_steps, guidance_scale, sigma_shift)
        if self._generate is None or self._gen_key != key:
            self._generate = self._build_generate(
                num_inference_steps, guidance_scale, sigma_shift)
            self._gen_key = key
        z0 = self._generate(self.m.mmdit,
                            (cond, pooled, uncond, neg_pooled), latents)
        if return_latents:
            return z0
        img = self._decode(self.m.vae, z0)
        img = (img.astype(jnp.float32) + 1.0) / 2.0
        return jnp.clip(img, 0.0, 1.0)

    def to_pil(self, images: jax.Array):
        from PIL import Image

        arr = (np.asarray(images) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
        return [Image.fromarray(a) for a in arr]
