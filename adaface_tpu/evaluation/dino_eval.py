"""DINO ViT-S/16 image-similarity evaluator (`evaluation/dino_eval.py`)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.vit import DINO_VITS16, init_vit_params, vit_encode

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def dino_preprocess(images: Sequence[np.ndarray], size: int = 224) -> np.ndarray:
    import cv2

    out = []
    for im in images:
        im = cv2.resize(im, (size, size), interpolation=cv2.INTER_CUBIC)
        im = im.astype(np.float32) / 255.0
        im = (im - IMAGENET_MEAN) / IMAGENET_STD
        out.append(im.transpose(2, 0, 1))
    return np.stack(out)


class DINOEvaluator:
    def __init__(self, params=None, cfg=DINO_VITS16, rng=None):
        self.cfg = cfg
        self.params = params or init_vit_params(
            rng if rng is not None else jax.random.PRNGKey(0), cfg)

    def image_features(self, images: Sequence[np.ndarray]) -> jax.Array:
        px = jnp.asarray(dino_preprocess(images))
        cls = vit_encode(self.params, px, self.cfg)["cls"]
        return cls / (jnp.linalg.norm(cls, axis=-1, keepdims=True) + 1e-8)

    def img_to_img_similarity(self, images_a, images_b) -> float:
        a = self.image_features(images_a)
        b = self.image_features(images_b)
        return float((a @ b.T).mean())
