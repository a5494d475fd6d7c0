"""Face-similarity metrics.

Rebuild of the face-sim half of `evaluation/eval_utils.py`
(`deepface_embed_images`/`insightface_embed_images:121-317`,
`calc_faces_similarities:318-366`, `compare_face_folders:367-443`):
embeddings come from the pluggable face backend (insightface when
installed, else our ArcFace-JAX with host detection); similarity is
all-pairs cosine between two image sets.

The reference notes calibration values (deepface ArcFace ≈0.47 cross-set
vs 0.62–0.66 within-set; insightface ≈0.34 vs 0.48–0.69,
`eval_utils.py:399-415`); with our backend the protocol is identical and
thresholds must be re-calibrated against locally-run reference numbers.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from adaface_tpu.id2ada.face_backends import FaceBackend, default_backend

IMG_EXTS = {".jpg", ".jpeg", ".png", ".webp", ".bmp"}


def load_folder_images(folder: str, limit: int | None = None) -> list[np.ndarray]:
    from PIL import Image

    paths = sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if os.path.splitext(f)[1].lower() in IMG_EXTS
    )
    if limit:
        paths = paths[:limit]
    return [np.asarray(Image.open(p).convert("RGB")) for p in paths]


def embed_images(
    images: Sequence[np.ndarray], backend: FaceBackend | None = None
) -> np.ndarray:
    """→ [N_detected, 512] normalized embeddings (undetected skipped)."""
    backend = backend or default_backend()
    embs = []
    for im in images:
        e = backend.detect_and_embed(im)
        if e is not None:
            embs.append(e)
    if not embs:
        return np.zeros((0, 512), np.float32)
    return np.stack(embs)


def calc_faces_similarities(embs_a: np.ndarray, embs_b: np.ndarray) -> float:
    """All-pairs mean cosine (`calc_faces_similarities:318-366`)."""
    if len(embs_a) == 0 or len(embs_b) == 0:
        return float("nan")
    a = embs_a / (np.linalg.norm(embs_a, axis=-1, keepdims=True) + 1e-8)
    b = embs_b / (np.linalg.norm(embs_b, axis=-1, keepdims=True) + 1e-8)
    return float((a @ b.T).mean())


def compare_face_images(
    images_a: Sequence[np.ndarray],
    images_b: Sequence[np.ndarray],
    backend: FaceBackend | None = None,
) -> dict:
    backend = backend or default_backend()
    ea = embed_images(images_a, backend)
    eb = embed_images(images_b, backend)
    return {
        "face_sim": calc_faces_similarities(ea, eb),
        "n_faces_a": len(ea),
        "n_faces_b": len(eb),
    }
