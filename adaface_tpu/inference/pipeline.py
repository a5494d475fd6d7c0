"""Text→image diffusion pipeline (SD1.5), fully jitted.

The TPU-native replacement for the diffusers `StableDiffusionPipeline` the
reference wraps (`adaface/adaface_wrapper.py:101-277`): prompt encoding,
the whole 25/50-step CFG DDIM loop, and VAE decode compile into two XLA
programs (text+loop, decode) with zero host round-trips in between.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models import clip as clip_mod
from adaface_tpu.models.unet import SD15_UNET, UNetConfig, unet_apply
from adaface_tpu.models.vae import SD_VAE, VAEConfig, vae_decode
from adaface_tpu.ops.samplers import DDIMConfig, ddim_sample
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer

Params = dict[str, Any]


@dataclasses.dataclass
class PipelineModules:
    unet: Params  # a single UNet, or a list for a UNetEnsemble
    vae: Params
    text_encoder: Params
    tokenizer: CLIPTokenizer
    unet_cfg: UNetConfig = SD15_UNET
    vae_cfg: VAEConfig = SD_VAE
    text_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_L_TEXT
    schedule: DiffusionSchedule | None = None
    # weighted UNet ensemble (`adaface/util.py:174-247` UNetEnsemble,
    # installed by AdaFaceWrapper when multiple unet paths are given)
    unet_weights: tuple | None = None
    # trained attn/FFN DoRA LoRAs for inference
    # (`load_unet_lora_weights`, `adaface_wrapper.py:374-413`)
    attn_lora: Params | None = None
    ffn_lora: Params | None = None
    ffn_adapter: str = "comp_distill"

    def __post_init__(self):
        if self.schedule is None:
            self.schedule = DiffusionSchedule.create()

    @classmethod
    def random_init(cls, rng: jax.Array, dtype=jnp.bfloat16,
                    unet_cfg: UNetConfig = SD15_UNET,
                    vae_cfg: VAEConfig = SD_VAE,
                    text_cfg: clip_mod.CLIPTextConfig = clip_mod.CLIP_L_TEXT):
        """Random-weight pipeline (benchmarks, tests)."""
        from adaface_tpu.models.unet import init_unet_params
        from adaface_tpu.models.vae import init_vae_params

        k1, k2, k3 = jax.random.split(rng, 3)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        return cls(
            unet=cast(init_unet_params(k1, unet_cfg)),
            vae=cast(init_vae_params(k2, vae_cfg)),
            text_encoder=cast(clip_mod.init_text_params(k3, text_cfg)),
            tokenizer=default_tokenizer(),
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, text_cfg=text_cfg,
        )


class DiffusionPipeline:
    def __init__(self, modules: PipelineModules, dtype=jnp.bfloat16,
                 quantize_unet: bool = False):
        """quantize_unet: int8 PTQ of the UNet convs (ops/quant.py) —
        ~8% faster sampling on v5e at corr 0.9988 vs bf16."""
        if quantize_unet:
            from adaface_tpu.ops.quant import quantize_unet_params

            q = quantize_unet_params(modules.unet)
            modules = dataclasses.replace(modules, unet=q)
        self.m = modules
        self.dtype = dtype
        self._generate = None
        self._decode = jax.jit(
            lambda vae, z: vae_decode(vae, z, self.m.vae_cfg))

    # ---------------------------------------------------------------- text
    def encode_prompt(
        self, prompts: list[str], negative_prompts: list[str] | None = None,
        max_length: int = 77,
    ):
        """→ (cond [B,S,D], uncond [B,S,D]|None) (`encode_prompt`,
        `adaface_wrapper.py:671-727`)."""
        ids = jnp.asarray(self.m.tokenizer(prompts, max_length=max_length))
        cond = clip_mod.text_encode(
            self.m.text_encoder, ids, self.m.text_cfg
        )["last_hidden_state"].astype(self.dtype)
        uncond = None
        if negative_prompts is not None:
            nids = jnp.asarray(self.m.tokenizer(negative_prompts,
                                                max_length=max_length))
            uncond = clip_mod.text_encode(
                self.m.text_encoder, nids, self.m.text_cfg
            )["last_hidden_state"].astype(self.dtype)
        return cond, uncond

    # ------------------------------------------------------------ sampling
    def _unet_eps(self, unet_params, x, t, ctx, attn_lora=None, ffn_lora=None,
                  tome=None):
        cfg = self.m.unet_cfg
        from adaface_tpu.models.unet import AttnRuntime

        rt = AttnRuntime(
            use_attn_lora=attn_lora is not None,
            use_ffn_lora=ffn_lora is not None,
            ffn_adapter=self.m.ffn_adapter if ffn_lora is not None else None,
        )
        kw = dict(rt=rt, attn_lora=attn_lora, ffn_lora=ffn_lora, tome=tome)
        if isinstance(unet_params, (list, tuple)):
            w = self.m.unet_weights or [1.0 / len(unet_params)] * len(unet_params)
            w = jnp.asarray(w) / jnp.asarray(w).sum()
            preds = [unet_apply(p, x, t, ctx, cfg, **kw)[0]
                     for p in unet_params]
            return sum(wi * p for wi, p in zip(w, preds))
        eps, _ = unet_apply(unet_params, x, t, ctx, cfg, **kw)
        return eps

    def _build_generate(self, ddim_cfg: DDIMConfig,
                        deepcache_interval: int = 0,
                        tome=None):
        schedule = self.m.schedule
        cfg = self.m.unet_cfg

        @jax.jit
        def generate(unet_params, loras, cond, uncond, x_T, rng):
            kw = dict(attn_lora=loras.get("attn"), ffn_lora=loras.get("ffn"),
                      tome=tome)

            def model_fn(x, t, ctx):
                return self._unet_eps(unet_params, x, t, ctx, **kw)

            dc = None
            if deepcache_interval > 1:
                assert not isinstance(unet_params, (list, tuple)), (
                    "deepcache is not supported with UNet ensembles")
                from adaface_tpu.models.unet import AttnRuntime

                rt = AttnRuntime(
                    use_attn_lora=kw["attn_lora"] is not None,
                    use_ffn_lora=kw["ffn_lora"] is not None,
                    ffn_adapter=(self.m.ffn_adapter
                                 if kw["ffn_lora"] is not None else None))

                def full_fn(x, t, ctx):
                    eps, _, cache = unet_apply(
                        unet_params, x, t, ctx, cfg, rt=rt, **kw,
                        deepcache="collect")
                    return eps, cache

                def shallow_fn(x, t, ctx, cache):
                    eps, _ = unet_apply(
                        unet_params, x, t, ctx, cfg, rt=rt, **kw,
                        deepcache=("shallow", cache))
                    return eps

                b2 = x_T.shape[0] * (2 if uncond is not None else 1)
                x2 = jnp.zeros((b2, *x_T.shape[1:]), x_T.dtype)
                t2 = jnp.zeros((b2,), jnp.int32)
                ctx2 = jnp.zeros((b2, *cond.shape[1:]), cond.dtype)
                cache_spec = jax.eval_shape(full_fn, x2, t2, ctx2)[1]
                init_cache = jnp.zeros(cache_spec.shape, cache_spec.dtype)
                dc = (deepcache_interval, full_fn, shallow_fn, init_cache)

            return ddim_sample(
                model_fn, schedule, x_T,
                cond_ctx=cond, uncond_ctx=uncond, cfg=ddim_cfg, rng=rng,
                deepcache=dc,
            )

        return generate

    def __call__(
        self,
        prompts: str | list[str],
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        guidance_scale_min: float | None = None,
        height: int = 512,
        width: int = 512,
        rng: jax.Array | None = None,
        latents: jax.Array | None = None,
        return_latents: bool = False,
        scheduler: str = "ddim",  # ddim | dpm++ | pndm | lcm
        # >1: full UNet every Nth step only; measured on v5e @ bench config:
        # 1.39x (3) / 1.54x (5) at latent corr 0.99999 vs the full loop
        deepcache_interval: int = 0,
        # >0: ToMe token merging (ops/tome.py) — merge this fraction of
        # level-0 spatial tokens around self-attn each step
        tome_ratio: float = 0.0,
        # full ToMe knob set (min_tokens/sx/sy/merge_mlp/rand_seed);
        # overrides tome_ratio when given
        tome: "ToMeConfig | None" = None,
    ):
        if isinstance(prompts, str):
            prompts = [prompts]
        b = len(prompts)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_lat, k_samp = jax.random.split(rng)
        if latents is None:
            s = self.m.vae_cfg.spatial_scale
            latents = jax.random.normal(
                k_lat, (b, 4, height // s, width // s), self.dtype)

        max_len = self.m.text_encoder["position_embedding"].shape[0]
        cond, uncond = self.encode_prompt(
            prompts, [negative_prompt] * b if guidance_scale > 1 else None,
            max_length=max_len)

        loras = {}
        if self.m.attn_lora is not None:
            loras["attn"] = self.m.attn_lora
        if self.m.ffn_lora is not None:
            loras["ffn"] = self.m.ffn_lora

        if tome is None and tome_ratio > 0.0:
            from adaface_tpu.ops.tome import ToMeConfig

            tome = ToMeConfig(ratio=tome_ratio)

        if scheduler == "ddim":
            ddim_cfg = DDIMConfig(
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                guidance_scale_min=guidance_scale_min,
            )
            # ToMeConfig is frozen/hashable — key on the whole config so
            # changing any knob (not just ratio) rebuilds the jitted loop
            key = (num_inference_steps, guidance_scale, guidance_scale_min,
                   deepcache_interval, tome)
            if self._generate is None or self._gen_key != key:
                self._generate = self._build_generate(
                    ddim_cfg, deepcache_interval=deepcache_interval,
                    tome=tome)
                self._gen_key = key
            z0 = self._generate(self.m.unet, loras, cond, uncond, latents,
                                k_samp)
        else:
            from adaface_tpu.ops.samplers import (
                dpm_solver_pp_sample, lcm_sample, pndm_sample)

            def model_fn(x, t, ctx):
                return self._unet_eps(self.m.unet, x, t, ctx,
                                      attn_lora=loras.get("attn"),
                                      ffn_lora=loras.get("ffn"),
                                      tome=tome)

            if scheduler == "dpm++":
                z0 = dpm_solver_pp_sample(
                    model_fn, self.m.schedule, latents, cond, uncond,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale)
            elif scheduler == "pndm":
                z0 = pndm_sample(
                    model_fn, self.m.schedule, latents, cond, uncond,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale)
            elif scheduler == "lcm":
                z0 = lcm_sample(
                    model_fn, self.m.schedule, latents, cond,
                    num_inference_steps=num_inference_steps, rng=k_samp)
            else:
                raise ValueError(f"unknown scheduler '{scheduler}'")
        if return_latents:
            return z0
        img = self._decode(self.m.vae, z0)
        img = (img.astype(jnp.float32) + 1.0) / 2.0
        return jnp.clip(img, 0.0, 1.0)

    def to_pil(self, images: jax.Array):
        from PIL import Image

        arr = (np.asarray(images) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
        return [Image.fromarray(a) for a in arr]
