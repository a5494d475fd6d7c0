"""CLIP-based text/image similarity evaluators.

Rebuild of `evaluation/clip_eval.py` (`CLIPEvaluator`/`ImageDirEvaluator`,
HF CLIPModel ViT-B/32): CLIP-T (prompt↔image) and CLIP-I (image↔image)
cosine scores with the learned text/visual projections.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.id2ada.face_id_to_ada_prompt import clip_preprocess
from adaface_tpu.models import clip as clip_mod
from adaface_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer

Params = dict[str, Any]

# ViT-B/32 (the reference evaluator backbone)
CLIP_B32_TEXT = clip_mod.CLIPTextConfig(
    hidden_size=512, num_layers=12, num_heads=8, intermediate_size=2048)
CLIP_B32_VISION = clip_mod.CLIPVisionConfig(
    hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072,
    patch_size=32, projection_dim=512)


class CLIPEvaluator:
    def __init__(
        self,
        text_params: Params | None = None,
        vision_params: Params | None = None,
        text_cfg=CLIP_B32_TEXT,
        vision_cfg=CLIP_B32_VISION,
        text_projection: jax.Array | None = None,
        tokenizer: CLIPTokenizer | None = None,
        rng: jax.Array | None = None,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        self.text_cfg = text_cfg
        self.vision_cfg = vision_cfg
        self.text_params = text_params or clip_mod.init_text_params(k1, text_cfg)
        self.vision_params = vision_params or clip_mod.init_vision_params(
            k2, vision_cfg)
        proj_dim = vision_cfg.projection_dim or vision_cfg.hidden_size
        self.text_projection = (
            text_projection if text_projection is not None
            else jax.random.normal(k3, (text_cfg.hidden_size, proj_dim))
            / np.sqrt(text_cfg.hidden_size))
        self.tokenizer = tokenizer or default_tokenizer()

    def text_features(self, prompts: Sequence[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        pooled = clip_mod.text_encode(
            self.text_params, ids, self.text_cfg, return_pooled=True)["pooled"]
        f = pooled @ self.text_projection
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    def image_features(self, images: Sequence[np.ndarray]) -> jax.Array:
        px = jnp.asarray(clip_preprocess(images))
        out = clip_mod.vision_encode(self.vision_params, px, self.vision_cfg)
        f = out.get("image_embeds", out["pooled"])
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    def txt_to_img_similarity(self, prompts, images) -> float:
        """CLIP-T: mean cosine between each prompt and each image."""
        t = self.text_features(prompts)
        v = self.image_features(images)
        return float((t @ v.T).mean())

    def img_to_img_similarity(self, images_a, images_b) -> float:
        """CLIP-I: mean pairwise cosine between two image sets."""
        a = self.image_features(images_a)
        b = self.image_features(images_b)
        return float((a @ b.T).mean())
