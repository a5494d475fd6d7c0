"""AdaFaceWrapper — the end-user inference facade.

Rebuild of `adaface/adaface_wrapper.py` (809 LoC): builds a diffusion
pipeline, extends the tokenizer with per-encoder placeholder tokens
(`z_enc0_0 … z_enc0_15, z_enc1_0 … z_enc1_3`,
`extend_tokenizer_and_text_encoder:415-457`), writes generated ada
embeddings into the extended token-embedding table
(`update_text_encoder_subj_embeddings:461-489`), appends the placeholder
string to user prompts (`update_prompt:491-532`), and runs CFG generation
(`forward:730-809`). Supports the img2img path (initial latents from a
noised source image) and ada/img embedding mixing for ablations
(`mix_ada_embs_with_other_embs:629-668`).

The SDXL branch ("text2imgxl", `adaface_wrapper.py:126,585-607`) and the
SD3 branch ("text2img3", `adaface_wrapper.py:128,601-607`) are both
implemented natively (`inference/sdxl_pipeline.py`,
`inference/sd3_pipeline.py` + `models/mmdit.py`): ada placeholders
extend the CLIP-L tokenizer/encoder exactly as in SD1.5, and the plain
prompt feeds the bigG encoder (`prompt_2 = plain_prompt`). Only Flux
keeps the API surface and raises NotImplementedError — a deliberate
skip matching the reference, whose own flux branch is commented out
(`adaface_wrapper.py:130`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules
from adaface_tpu.models.vae import vae_encode
from adaface_tpu.text.embedding_manager import extend_token_embedding

Params = dict[str, Any]

SUPPORTED_PIPELINES = ("text2img", "img2img", "text2video", "text2imgxl",
                       "text2img3")


class AdaFaceWrapper:
    def __init__(
        self,
        pipeline_name: str,
        modules: PipelineModules,
        id2ada_prompt_encoder,
        guidance_scale: float = 6.0,
        num_inference_steps: int = 50,
        out_id_embs_cfg_scale: float | None = None,
        dtype=jnp.bfloat16,
        max_prompt_length: int = 77,
        motion: Params | None = None,  # temporal modules for text2video
        motion_cfg=None,  # MotionConfig (defaults to MM_SD15_V2)
        quantize_unet: bool = False,  # int8 PTQ serving mode (ops/quant.py)
    ):
        if pipeline_name == "flux":
            raise NotImplementedError(
                "the flux pipeline keeps API parity but is unimplemented "
                "(commented out in the reference too, "
                "`adaface_wrapper.py:130`)")
        # reference naming aliases
        pipeline_name = {"sdxl": "text2imgxl",
                         "sd3": "text2img3"}.get(pipeline_name, pipeline_name)
        assert pipeline_name in SUPPORTED_PIPELINES, pipeline_name
        self.pipeline_name = pipeline_name
        if pipeline_name == "text2imgxl":
            from adaface_tpu.inference.sdxl_pipeline import SDXLPipeline

            self.pipeline = SDXLPipeline(modules, dtype=dtype)
        elif pipeline_name == "text2img3":
            from adaface_tpu.inference.sd3_pipeline import SD3Pipeline

            self.pipeline = SD3Pipeline(modules, dtype=dtype)
        elif pipeline_name == "text2video":
            # AdaFace-Animate path: ada tokens condition the motion-module
            # video UNet (`inference/video_pipeline.py`)
            from adaface_tpu.inference.video_pipeline import VideoPipeline
            from adaface_tpu.models.motion import (MM_SD15_V2,
                                                   init_motion_params)

            if motion_cfg is None:
                motion_cfg = MM_SD15_V2
            if motion is None:
                motion = init_motion_params(jax.random.PRNGKey(0),
                                            modules.unet_cfg, motion_cfg)
            self.pipeline = VideoPipeline(modules, motion,
                                          motion_cfg=motion_cfg, dtype=dtype)
        else:
            self.pipeline = DiffusionPipeline(modules, dtype=dtype,
                                              quantize_unet=quantize_unet)
        self.id2ada_prompt_encoder = id2ada_prompt_encoder
        self.guidance_scale = guidance_scale
        self.num_inference_steps = num_inference_steps
        if out_id_embs_cfg_scale is not None:
            id2ada_prompt_encoder.out_id_embs_cfg_scale = out_id_embs_cfg_scale
        self.dtype = dtype
        if max_prompt_length > 77:
            # prompt-length extension to 97/147 by reusing the trailing
            # position embeddings (`adaface_wrapper.py:204-222`)
            from adaface_tpu.models.clip import extend_position_embedding

            modules.text_encoder = extend_position_embedding(
                modules.text_encoder, max_prompt_length)
        self.max_prompt_length = max_prompt_length
        self.placeholder_tokens: list[list[str]] = []
        self.placeholder_token_ids: list[list[int]] = []
        self.extend_tokenizer_and_text_encoder()

    # ------------------------------------------------------------------
    def _encoder_list(self):
        enc = self.id2ada_prompt_encoder
        return getattr(enc, "encoders", [enc])

    def extend_tokenizer_and_text_encoder(self):
        """Add `z_{i}_{j}` placeholder tokens per encoder and grow the
        embedding table (`adaface_wrapper.py:415-457`)."""
        tok = self.pipeline.m.tokenizer
        n_added = 0
        for i, enc in enumerate(self._encoder_list()):
            names = [f"z_{i}_{j}" for j in range(enc.num_id_vecs)]
            ids = tok.add_tokens(names)
            self.placeholder_tokens.append(names)
            self.placeholder_token_ids.append(ids)
            n_added += len(ids)
        table = self.pipeline.m.text_encoder["token_embedding"]
        need = tok.vocab_size - table.shape[0]
        if need > 0:
            self.pipeline.m.text_encoder["token_embedding"] = (
                extend_token_embedding(table, need).astype(table.dtype))

    def update_text_encoder_subj_embeddings(self, ada_embs: jax.Array):
        """Write ada embeddings into the placeholder rows
        (`adaface_wrapper.py:461-489`). ada_embs: [sum_K, D]."""
        table = self.pipeline.m.text_encoder["token_embedding"]
        offset = 0
        for ids in self.placeholder_token_ids:
            k = len(ids)
            rows = jnp.asarray(ids)
            table = table.at[rows].set(
                ada_embs[offset:offset + k].astype(table.dtype))
            offset += k
        self.pipeline.m.text_encoder["token_embedding"] = table

    def update_prompt(self, prompt: str) -> str:
        """Append the placeholder strings unless already present
        (`adaface_wrapper.py:491-532`)."""
        ph = " ".join(" ".join(names) for names in self.placeholder_tokens)
        if ph and ph not in prompt:
            prompt = f"{prompt} {ph}" if prompt else ph
        return prompt

    # ------------------------------------------------------------------
    def prepare_adaface_embeddings(
        self,
        images: Sequence[np.ndarray] | None = None,
        face_id_embs=None,
        update_text_encoder: bool = True,
        avg_at_stage: str = "id_emb",
        perturb_std: float = 0.0,
    ):
        """Images → ada embeddings (→ text-encoder rows)
        (`adaface_wrapper.py:541-627`)."""
        ada, _, _ = self.id2ada_prompt_encoder.generate_adaface_embeddings(
            images=images, face_id_embs=face_id_embs,
            avg_at_stage=avg_at_stage,
            perturb_std=perturb_std,
        )
        if ada is None:
            return None
        if update_text_encoder:
            self.update_text_encoder_subj_embeddings(ada)
        return ada

    def make_batcher(self, num_slots: int = 8,
                     num_inference_steps: int | None = None, **kw):
        """Continuous-batching server over this wrapper's pipeline: requests
        for *different subjects* share one device batch (per-sample ada
        injection instead of the reference's shared-table writes,
        `adaface_wrapper.py:461-489`), and slots refill per denoise step.
        Build requests with `make_request`."""
        from adaface_tpu.inference.serving import ContinuousBatcher

        all_ids = [i for ids in self.placeholder_token_ids for i in ids]
        return ContinuousBatcher(
            self.pipeline.m, num_slots=num_slots,
            num_inference_steps=num_inference_steps or self.num_inference_steps,
            placeholder_token_ids=all_ids, dtype=self.dtype, **kw)

    def make_request(self, prompt: str, ada_embs=None,
                     negative_prompt: str = "", **kw):
        """Request for `make_batcher`: appends the placeholder strings to
        the prompt (update_prompt) and carries the subject's ada embeddings
        (from `prepare_adaface_embeddings(update_text_encoder=False)`)."""
        from adaface_tpu.inference.serving import Request

        gs = kw.pop("guidance_scale", self.guidance_scale)
        return Request(prompt=self.update_prompt(prompt),
                       negative_prompt=negative_prompt,
                       ada_embs=ada_embs, guidance_scale=gs, **kw)

    def load_unet_lora_weights(self, ckpt_dir: str,
                               ffn_adapter: str = "comp_distill"):
        """Load trained UNet attn/FFN DoRA LoRAs from an adaface checkpoint
        into the pipeline (`load_unet_lora_weights`,
        `adaface_wrapper.py:374-413`). The FFN LoRA uses the named adapter
        trained for comp distillation by default."""
        from adaface_tpu.train.checkpoint import load_checkpoint

        state, _ = load_checkpoint(ckpt_dir)
        lora = state.get("unet_lora_modules")
        if lora is None:
            raise ValueError(f"no unet_lora_modules in {ckpt_dir}")
        self.pipeline.m.attn_lora = lora.get("attn_lora")
        ffn = lora.get("ffn_lora")
        if ffn is not None and ffn_adapter in ffn:
            self.pipeline.m.ffn_lora = ffn
            self.pipeline.m.ffn_adapter = ffn_adapter
        n = len(jax.tree_util.tree_leaves(lora))
        print(f"loaded {n} UNet LoRA tensors from {ckpt_dir}")

    def mix_ada_embs_with_other_embs(
        self, ada_embs: jax.Array, other_embs: jax.Array, mix_scale: float
    ) -> jax.Array:
        """Ablation mixing (`mix_ada_embs_with_other_embs:629-668`)."""
        return ada_embs * mix_scale + other_embs * (1.0 - mix_scale)

    # ------------------------------------------------------------------
    def __call__(self, *a, **kw):
        return self.forward(*a, **kw)

    def forward(
        self,
        prompt: str,
        negative_prompt: str = ("flaws in the eyes, flaws in the face, lowres, "
                                "non-HDRi, low quality"),
        num_images: int = 1,
        guidance_scale: float | None = None,
        num_inference_steps: int | None = None,
        init_image: np.ndarray | None = None,
        strength: float = 0.8,
        rng: jax.Array | None = None,
        update_prompt: bool = True,
        height: int = 512,
        width: int = 512,
        scheduler: str = "ddim",  # ddim | dpm++ | pndm | lcm
        num_frames: int = 16,  # text2video only
    ):
        """→ images [N, 3, H, W] in [0, 1] (text2video: [N, F, 3, H, W])."""
        plain_prompt = prompt
        if update_prompt:
            prompt = self.update_prompt(prompt)
        gs = guidance_scale if guidance_scale is not None else self.guidance_scale
        steps = (num_inference_steps if num_inference_steps is not None
                 else self.num_inference_steps)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        if self.pipeline_name in ("text2imgxl", "text2img3"):
            # placeholders ride encoder 1; the other towers see the plain
            # prompt (`prompt_2 = plain_prompt`, `adaface_wrapper.py:586`)
            return self.pipeline(
                [prompt] * num_images,
                prompts_2=[plain_prompt] * num_images,
                negative_prompt=negative_prompt,
                num_inference_steps=steps,
                guidance_scale=gs,
                height=height, width=width,
                rng=rng,
            )

        if self.pipeline_name == "text2video":
            return self.pipeline(
                [prompt] * num_images,
                negative_prompt=negative_prompt,
                num_frames=num_frames,
                num_inference_steps=steps,
                guidance_scale=gs,
                height=height, width=width,
                rng=rng,
            )

        latents = None
        if self.pipeline_name == "img2img":
            assert init_image is not None
            latents = self._img2img_latents(init_image, strength, steps, rng,
                                            num_images)
            steps = max(int(steps * strength), 1)
        return self.pipeline(
            [prompt] * num_images,
            negative_prompt=negative_prompt,
            num_inference_steps=steps,
            guidance_scale=gs,
            rng=rng,
            latents=latents,
            height=height,
            width=width,
            scheduler=scheduler,
        )

    def _img2img_latents(self, init_image, strength, steps, rng, num_images):
        img = jnp.asarray(init_image, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        img = img.transpose(0, 3, 1, 2) / 127.5 - 1.0
        k1, k2 = jax.random.split(rng)
        z = vae_encode(self.pipeline.m.vae, img.astype(self.dtype),
                       self.pipeline.m.vae_cfg, rng=k1)
        z = jnp.repeat(z, num_images, axis=0)
        t0 = int(self.pipeline.m.schedule.num_timesteps * strength)
        noise = jax.random.normal(k2, z.shape, z.dtype)
        t = jnp.full((z.shape[0],), t0 - 1, jnp.int32)
        return self.pipeline.m.schedule.q_sample(z, t, noise).astype(self.dtype)
