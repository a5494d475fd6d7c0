"""ArcFace identity losses with gradient-masked face crops.

Rebuild of `ldm/modules/arcface_wrapper.py`: the generated images are
decoded, faces located (host-side detection; see `detect_face_bboxes`),
cropped *differentiably* in-graph, converted to grayscale 128×128, and
embedded with the frozen ArcFace resnet18. Two gradient masks shape the
training signal (`embed_image_tensor:89-166`):

- center mask (ratio 1 ⇒ disabled by default): align-loss grads hit only
  the face center so the face is not encouraged to grow;
- border mask (ratio 0.3): suppress-loss grads hit only the border so the
  face shrinks from the outside without destroying identity.

`calc_arcface_align_loss` (`:171-230`): cosine-embedding alignment between
reference and generated embeddings + L2 suppression of the border
embedding and of background-face embeddings, instance-masked by detection
success.

Host/device split: detection runs on host (pluggable cascade/insightface);
bboxes are data inputs, crops are `bilinear_crop` gathers so gradients
reach the generated image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.arcface import arcface_embed

# numpy (NOT jnp): this module may be first imported inside a jit
# trace (comp_step lazily imports comp_face_align in its traced loss
# fn), and a module-level jnp array created under a trace leaks that
# trace's tracer into every later graph (UnexpectedTracerError on the
# chip, 2026-08-21)
RGB_TO_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gradient_mask(x, mask):
    """Identity forward; cotangent multiplied by mask (`MaskedGrad:9-47`)."""
    return x


def _gm_fwd(x, mask):
    return x, mask


def _gm_bwd(mask, g):
    return g * mask, None


gradient_mask.defvjp(_gm_fwd, _gm_bwd)


def bilinear_crop(
    images: jax.Array,  # [B, C, H, W]
    bboxes: jax.Array,  # [B, 4] (x0, y0, x1, y1) in pixels (float ok)
    out_size: int = 128,
) -> jax.Array:
    """Differentiable per-instance crop+resize via bilinear gather."""
    b, c, h, w = images.shape
    x0, y0, x1, y1 = [bboxes[:, i].astype(jnp.float32) for i in range(4)]
    ty = jnp.linspace(0.0, 1.0, out_size)
    tx = jnp.linspace(0.0, 1.0, out_size)
    ys = y0[:, None] + ty[None, :] * (y1 - y0 - 1)[:, None]  # [B, out]
    xs = x0[:, None] + tx[None, :] * (x1 - x0 - 1)[:, None]
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)

    y0i = jnp.floor(ys).astype(jnp.int32)
    x0i = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    wy = (ys - y0i)[:, None, :, None]  # [B,1,out,1]
    wx = (xs - x0i)[:, None, None, :]  # [B,1,1,out]

    def per_image(img, yi, xi):
        # img [C,H,W]; yi/xi [out]
        rows = img[:, yi, :]  # [C, out, W]
        return rows[:, :, xi]  # [C, out, out]

    g00 = jax.vmap(per_image)(images, y0i, x0i)
    g01 = jax.vmap(per_image)(images, y0i, x1i)
    g10 = jax.vmap(per_image)(images, y1i, x0i)
    g11 = jax.vmap(per_image)(images, y1i, x1i)
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy


def _central_mask(out_size: int, ratio: float) -> jax.Array:
    """[1,1,S,S] with the central `ratio` square set to 1."""
    m = jnp.zeros((out_size, out_size), jnp.float32)
    ml = int(out_size * (1 - ratio) / 2)
    mr = out_size - ml
    m = m.at[ml:mr, ml:mr].set(1.0)
    return m[None, None]


def embed_face_crops(
    arcface_params,
    images: jax.Array,  # [B, 3, H, W] in [-1, 1]
    bboxes: jax.Array,  # [B, 4]
    fg_faces_grad_mask_ratios: tuple[float, float] = (1.0, 0.3),
):
    """→ (emb_center [B,512], emb_border [B,512])."""
    crops = bilinear_crop(images, bboxes, 128)
    gray = (crops * RGB_TO_GRAY[None, :, None, None]).sum(axis=1, keepdims=True)
    center_ratio, border_ratio = fg_faces_grad_mask_ratios

    if 0 < center_ratio < 1:
        gray_center = gradient_mask(gray, _central_mask(128, center_ratio))
    else:
        gray_center = gray
    emb_center = arcface_embed(arcface_params, gray_center)

    if 0 < border_ratio < 1:
        border_mask = 1.0 - _central_mask(128, border_ratio)
        gray_border = gradient_mask(gray, border_mask)
        emb_border = arcface_embed(arcface_params, gray_border)
    else:
        emb_border = emb_center
    return emb_center, emb_border


def calc_arcface_align_loss(
    arcface_params,
    ref_images: jax.Array,  # [B, 3, H, W]
    aligned_images: jax.Array,  # [B, 3, H, W] (generated, grads flow)
    ref_bboxes: jax.Array,  # [B, 4] host-detected
    aligned_bboxes: jax.Array,
    face_detected_mask: jax.Array,  # [B] 1 where aligned face detected
    bg_bboxes: jax.Array | None = None,  # [Nbg, 4] background faces
    bg_image_idx: jax.Array | None = None,  # [Nbg] which image each bg box is in
    fg_faces_grad_mask_ratios=(1.0, 0.3),
):
    """→ (loss_align, loss_fg_suppress, loss_bg_suppress)."""
    ref_emb, _ = embed_face_crops(
        arcface_params, jax.lax.stop_gradient(ref_images), ref_bboxes,
        (-1.0, -1.0))
    ref_emb = jax.lax.stop_gradient(ref_emb)
    emb_center, emb_border = embed_face_crops(
        arcface_params, aligned_images, aligned_bboxes,
        fg_faces_grad_mask_ratios)

    if ref_emb.shape[0] < emb_center.shape[0]:
        ref_emb = jnp.tile(ref_emb, (emb_center.shape[0] // ref_emb.shape[0], 1))

    def cos(a, b):
        num = (a * b).sum(-1)
        return num / (jnp.sqrt((a * a).sum(-1) + 1e-8)
                      * jnp.sqrt((b * b).sum(-1) + 1e-8))

    m = face_detected_mask.astype(jnp.float32)
    denom = m.sum() + 1e-6
    loss_align = ((1.0 - cos(ref_emb, emb_center)) * m).sum() / denom
    loss_fg_suppress = ((emb_border ** 2).mean(-1) * m).sum() / denom

    loss_bg = jnp.float32(0.0)
    if bg_bboxes is not None and bg_image_idx is not None and len(bg_bboxes):
        bg_imgs = aligned_images[bg_image_idx]
        bg_emb, _ = embed_face_crops(arcface_params, bg_imgs, bg_bboxes,
                                     (-1.0, -1.0))
        loss_bg = (bg_emb ** 2).mean()
    return loss_align, loss_fg_suppress, loss_bg


def calc_bg_faces_suppress_loss(
    arcface_params,
    images: jax.Array,  # [B, 3, H, W] generated (grads flow)
    bg_bboxes: jax.Array,  # [B, Nbg, 4] pixel coords
    bg_valid: jax.Array,  # [B, Nbg] ∈ {0, 1}
) -> tuple[jax.Array, jax.Array]:
    """Mean-L2 suppression of background-face embeddings with a STATIC
    max-faces shape (`arcface_wrapper.calc_arcface_align_loss` embeds the
    dynamic list of non-largest detected faces; here invalid slots are
    masked out). → (loss, any_valid ∈ {0,1})."""
    b, nbg = bg_valid.shape
    imgs_rep = jnp.repeat(images, nbg, axis=0)  # [B*Nbg, 3, H, W]
    boxes = bg_bboxes.reshape(b * nbg, 4)
    emb, _ = embed_face_crops(arcface_params, imgs_rep, boxes, (-1.0, -1.0))
    per_face = (emb.astype(jnp.float32) ** 2).mean(-1)  # [B*Nbg]
    v = bg_valid.reshape(-1).astype(jnp.float32)
    any_valid = (v.sum() > 0).astype(jnp.float32)
    loss = (per_face * v).sum() / (v.sum() + 1e-6)
    return loss * any_valid, any_valid


# ---------------------------------------------------------------------------
# host-side detection
# ---------------------------------------------------------------------------

_CASCADE = None


def _load_cascade():
    import os

    import cv2

    candidates = []
    if hasattr(cv2, "data") and hasattr(cv2.data, "haarcascades"):
        candidates.append(os.path.join(
            cv2.data.haarcascades, "haarcascade_frontalface_default.xml"))
    candidates.append("/usr/share/opencv4/haarcascades/"
                      "haarcascade_frontalface_default.xml")
    if not hasattr(cv2, "CascadeClassifier"):
        return None  # minimal cv2 builds ship without objdetect
    for path in candidates:
        if os.path.exists(path):
            c = cv2.CascadeClassifier(path)
            if not c.empty():
                return c
    return None


def detect_face_bboxes(
    images_np: np.ndarray,  # [B, 3, H, W] in [-1, 1] or [B, H, W, 3] uint8
    min_size: int = 20,
    heuristic_center: bool = False,
    retinaface_client=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Host face detection → (bboxes [B,4], detected [B]).

    Detector chain: insightface SCRFD (if installed) → OpenCV Haar cascade
    (if XMLs present) → none. Undetected instances get a full-image bbox
    and detected=0, mirroring `RetinaFaceClient.crop_faces`
    (`evaluation/retinaface_pytorch.py`). With `heuristic_center` and no
    detector available, a central 60% box is returned with detected=1
    (random-weight smoke tests / synthetic data only).
    """
    global _CASCADE
    import cv2

    if images_np.ndim == 4 and images_np.shape[1] == 3:
        imgs = ((images_np.transpose(0, 2, 3, 1) + 1) * 127.5)
        imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    else:
        imgs = images_np.astype(np.uint8)

    if retinaface_client is not None:
        b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        bboxes = np.zeros((b, 4), np.float32)
        detected = np.zeros((b,), np.float32)
        for i in range(b):
            faces = retinaface_client.detect_faces(imgs[i], T=min_size)
            if faces:
                bboxes[i] = faces[0]["bbox"]
                detected[i] = 1.0
            else:
                bboxes[i] = (0, 0, w, h)
        return bboxes, detected

    if _CASCADE is None:
        _CASCADE = _load_cascade() or "unavailable"

    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    bboxes = np.zeros((b, 4), np.float32)
    detected = np.zeros((b,), np.float32)
    for i in range(b):
        faces = ()
        if _CASCADE != "unavailable":
            gray = cv2.cvtColor(imgs[i], cv2.COLOR_RGB2GRAY)
            faces = _CASCADE.detectMultiScale(
                gray, 1.1, 4, minSize=(min_size, min_size))
        if len(faces):
            # largest face
            x, y, fw, fh = max(faces, key=lambda f: f[2] * f[3])
            bboxes[i] = (x, y, x + fw, y + fh)
            detected[i] = 1.0
        elif heuristic_center:
            bboxes[i] = (0.2 * w, 0.2 * h, 0.8 * w, 0.8 * h)
            detected[i] = 1.0
        else:
            bboxes[i] = (0, 0, w, h)
    return bboxes, detected
