"""Host face detection as an in-graph callback (detection-on-recons).

The reference detects faces on the *decoded reconstructions* inside the
training iteration (`ldm/models/diffusion/ddpm.py:2511-2534` via
`arcface_wrapper.calc_arcface_align_loss`, and `ddpm.py:3225-3301` via
`retinaface.crop_faces`) — SURVEY §7 "hard part 2": host↔device
choreography for face-dependent losses. The TPU-native design keeps the
denoise→decode→loss pipeline in ONE jitted graph and hops to the host
for the non-differentiable detection via `jax.pure_callback` on a
stop-gradient'd copy of the decoded image; the returned bboxes re-enter
the graph as data and the differentiable crops (`face_losses.
bilinear_crop`) apply to the live tensors.

Under automatic partitioning (pjit over a dp×tp mesh) XLA gathers the
callback operand to host, runs the callback once on the full batch, and
re-shards the outputs — verified on an 8-device CPU mesh to produce
bitwise the same loss as single-device.

The host side never raises: any detector failure degrades to
"no face detected, full-image bbox", mirroring
`RetinaFaceClient.crop_faces` (`evaluation/retinaface_pytorch.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FaceDetections:
    """Host detection results for a batch of images (all np/jnp arrays).

    fg_bboxes [B, 4] (x0, y0, x1, y1) pixel coords of the largest face
    (full-image box when undetected); detected [B] ∈ {0, 1};
    confidences [B] (1.0 where the backend gives no score);
    bg_bboxes [B, MAX_BG, 4] non-largest faces; bg_valid [B, MAX_BG].
    """

    fg_bboxes: np.ndarray
    detected: np.ndarray
    confidences: np.ndarray
    bg_bboxes: np.ndarray
    bg_valid: np.ndarray


MAX_BG_FACES = 2


class HostFaceDetector:
    """Pluggable host-side detector chain.

    Backends (first available wins): an injected `detector_fn`
    (tests / SCRFD / custom), insightface FaceAnalysis, the OpenCV Haar
    cascade. `detector_fn(img_uint8_rgb) -> list[(bbox(4,), score)]`
    sorted any way; we rank by area.
    """

    def __init__(self, detector_fn: Callable | None = None,
                 min_size: int = 20, max_bg: int = MAX_BG_FACES):
        self.detector_fn = detector_fn
        self.min_size = min_size
        self.max_bg = max_bg
        self._insight = None
        self._cascade = None
        self._backend = None

    # ------------------------------------------------------------ backends
    def _detect_one(self, img: np.ndarray) -> list[tuple[np.ndarray, float]]:
        """img uint8 RGB [H, W, 3] → [(bbox, score)]."""
        if self.detector_fn is not None:
            return list(self.detector_fn(img) or [])
        if self._backend is None:
            self._backend = self._pick_backend()
        if self._backend == "insightface":
            faces = self._insight.get(img)
            return [(np.asarray(f.bbox, np.float32), float(f.det_score))
                    for f in faces]
        if self._backend == "cascade":
            import cv2

            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
            faces = self._cascade.detectMultiScale(
                gray, 1.1, 4, minSize=(self.min_size, self.min_size))
            return [(np.asarray((x, y, x + w, y + h), np.float32), 1.0)
                    for (x, y, w, h) in faces]
        return []

    def _pick_backend(self) -> str:
        try:
            from insightface.app import FaceAnalysis  # type: ignore

            app = FaceAnalysis(allowed_modules=["detection"])
            app.prepare(ctx_id=-1, det_size=(512, 512))
            self._insight = app
            return "insightface"
        except Exception:
            pass
        try:
            from adaface_tpu.train.face_losses import _load_cascade

            cascade = _load_cascade()
            if cascade is not None:
                self._cascade = cascade
                return "cascade"
        except Exception:
            pass
        return "none"

    # ------------------------------------------------------------- __call__
    def __call__(self, images: np.ndarray) -> FaceDetections:
        """images [B, 3, H, W] float in [-1, 1] (or [B, H, W, 3] uint8)."""
        imgs = np.asarray(images)
        if imgs.ndim == 4 and imgs.shape[1] == 3:
            imgs = np.clip((imgs.transpose(0, 2, 3, 1) + 1) * 127.5,
                           0, 255).astype(np.uint8)
        else:
            imgs = imgs.astype(np.uint8)
        b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        fg = np.zeros((b, 4), np.float32)
        det = np.zeros((b,), np.float32)
        conf = np.zeros((b,), np.float32)
        bg = np.zeros((b, self.max_bg, 4), np.float32)
        bgv = np.zeros((b, self.max_bg), np.float32)
        for i in range(b):
            try:
                faces = [
                    (f, s) for (f, s) in self._detect_one(imgs[i])
                    if (f[2] - f[0]) >= self.min_size
                    and (f[3] - f[1]) >= self.min_size]
            except Exception:
                faces = []
            if faces:
                faces.sort(key=lambda fs: -((fs[0][2] - fs[0][0])
                                            * (fs[0][3] - fs[0][1])))
                bb, sc = faces[0]
                fg[i] = np.clip(bb, 0, (w, h, w, h))
                det[i] = 1.0
                conf[i] = sc
                for j, (bb2, _) in enumerate(faces[1:1 + self.max_bg]):
                    bg[i, j] = np.clip(bb2, 0, (w, h, w, h))
                    bgv[i, j] = 1.0
            else:
                fg[i] = (0, 0, w, h)
        return FaceDetections(fg, det, conf, bg, bgv)


def detect_faces_in_graph(
    images: jax.Array,  # [B, 3, H, W] float in [-1, 1] (traced)
    detector: HostFaceDetector,
    max_bg: int = MAX_BG_FACES,
):
    """Host detection inside a jitted (and differentiated) graph.

    → (fg_bboxes [B,4] f32 pixels, detected [B], confidences [B],
    bg_bboxes [B,max_bg,4], bg_valid [B,max_bg]). The operand is
    stop-gradient'd so jax.grad never attempts to differentiate the
    callback; the outputs are data (constants w.r.t. params).
    """
    b = images.shape[0]

    def host(imgs):
        d = detector(np.asarray(imgs))
        return (d.fg_bboxes, d.detected, d.confidences,
                d.bg_bboxes[:, :max_bg], d.bg_valid[:, :max_bg])

    shapes = (
        jax.ShapeDtypeStruct((b, 4), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b, max_bg, 4), jnp.float32),
        jax.ShapeDtypeStruct((b, max_bg), jnp.float32),
    )
    return jax.pure_callback(
        host, shapes,
        jax.lax.stop_gradient(images).astype(jnp.float32))


_CALLBACK_SUPPORT: dict[str, bool] = {}


def backend_supports_callbacks() -> bool:
    """Probe whether the default backend can run host callbacks inside
    jit. Some PJRT plugins (the axon TPU relay) raise UNIMPLEMENTED for
    host send/recv — those backends must use the two-phase detection
    choreography (recon_step.make_two_phase_recon_step) instead of the
    in-graph pure_callback."""
    platform = jax.default_backend()
    if platform not in _CALLBACK_SUPPORT:
        try:
            out = jax.jit(lambda x: jax.pure_callback(
                lambda v: np.asarray(v),
                jax.ShapeDtypeStruct((), jnp.float32), x))(jnp.float32(1.0))
            _CALLBACK_SUPPORT[platform] = bool(float(out) == 1.0)
        except Exception:
            _CALLBACK_SUPPORT[platform] = False
    return _CALLBACK_SUPPORT[platform]


def bbox_latent_mask(bboxes: jax.Array, detected: jax.Array,
                     hw: tuple[int, int]) -> jax.Array:
    """[B,4] latent-coord boxes → [B,1,h,w] {0,1} mask; undetected rows
    become all-ones (the reference's full-image fallback keeps the recon
    loss applying to the whole image, `ddpm.py:2741-2749`)."""
    h, w = hw
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    x0, y0, x1, y1 = [bboxes[:, i, None, None] for i in range(4)]
    m = ((xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)).astype(jnp.float32)
    full = jnp.ones((bboxes.shape[0], h, w), jnp.float32)
    d = detected[:, None, None]
    return (m * d + full * (1.0 - d))[:, None]


def map_bboxes_to_latent(bboxes: jax.Array, pixel_size: int,
                         latent_size: int) -> jax.Array:
    """Pixel-space boxes → latent coords (`map_bboxes_coords`,
    `ldm/util.py`: integer downscale by the 8x VAE stride)."""
    scale = latent_size / pixel_size
    return jnp.floor(bboxes * scale)
