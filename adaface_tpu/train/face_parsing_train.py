"""BiSeNet face-parsing training: OHEM loss + warmup/poly SGD.

Rebuild of the reference's face-parsing training path
(`face_parsing/train.py:1-179`, `loss.py:12-28` OhemCELoss,
`optimizer.py:10-66` warmup-exponential → poly-decay SGD with 10× lr_mul
parameter groups, `face_dataset.py` / `transform.py` augmentations). The
reference runs this on the InPlace-ABN CUDA extension; here training-mode
BN is the fused Pallas BN+leaky-ReLU kernel (`ops/fused_norm.py`) and the
whole step jits into one XLA program. Sync-BN across data-parallel shards
is the kernel's `axis_name` psum.

TPU-first notes: OHEM's data-dependent "keep losses > thresh, but at
least n_min" selection (`loss.py:20-27`) is a sort in torch; here it is a
fixed-shape `jax.lax.top_k` over the flattened per-pixel loss plus a mask
— no dynamic shapes, so one compiled graph serves every batch.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaface_tpu.models.bisenet import N_CLASSES, bisenet_forward

Params = dict[str, Any]

IGNORE_LABEL = 255


# ---------------------------------------------------------------------------
# OHEM cross-entropy (`face_parsing/loss.py:12-28`)
# ---------------------------------------------------------------------------


def ohem_ce_loss(
    logits: jax.Array,  # [B, C, H, W]
    labels: jax.Array,  # [B, H, W] int32, IGNORE_LABEL = ignored
    thresh: float = 0.7,
    n_min: int | None = None,
) -> jax.Array:
    """Online hard-example mining CE: keep every pixel whose CE exceeds
    -log(thresh) if more than n_min qualify, else the top n_min pixels.

    The reference sorts all pixel losses (`loss.py:20-27`); top_k over the
    flattened loss is the fixed-shape equivalent.
    """
    b, c, h, w = logits.shape
    if n_min is None:
        n_min = b * h * w // 16  # train.py:64: n_img*cropsize²//16
    n_min = max(min(n_min, b * h * w), 1)

    valid = labels != IGNORE_LABEL
    lbl = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    nll = -jnp.take_along_axis(logp, lbl[:, None], axis=1)[:, 0]  # [B,H,W]
    nll = jnp.where(valid, nll, 0.0).reshape(-1)

    thresh_l = -math.log(thresh)
    topk, _ = jax.lax.top_k(nll, n_min)
    # if the n_min-th largest loss still exceeds thresh → keep all > thresh;
    # else keep exactly the top n_min (loss.py:23-27)
    use_thresh = topk[n_min - 1] > thresh_l
    above = nll > thresh_l
    sum_above = jnp.sum(jnp.where(above, nll, 0.0))
    cnt_above = jnp.maximum(jnp.sum(above), 1)
    mean_above = sum_above / cnt_above
    mean_topk = jnp.mean(topk)
    return jnp.where(use_thresh, mean_above, mean_topk)


def softmax_focal_loss(
    logits: jax.Array, labels: jax.Array, gamma: float = 2.0
) -> jax.Array:
    """`loss.py:31-43` (provided but unused by the reference's train.py)."""
    valid = labels != IGNORE_LABEL
    lbl = jnp.where(valid, labels, 0).astype(jnp.int32)
    logits = logits.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=1)
    logp = jax.nn.log_softmax(logits, axis=1) * (1.0 - p) ** gamma
    nll = -jnp.take_along_axis(logp, lbl[:, None], axis=1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# Warmup-exponential → poly SGD (`face_parsing/optimizer.py:10-66`)
# ---------------------------------------------------------------------------


def warmup_poly_lr(
    step: jax.Array | int,
    lr0: float = 1e-2,
    warmup_steps: int = 1000,
    warmup_start_lr: float = 1e-5,
    max_iter: int = 80_000,
    power: float = 0.9,
):
    """`optimizer.py:42-48`: exponential ramp to lr0 then poly decay."""
    step = jnp.asarray(step, jnp.float32)
    wf = (lr0 / warmup_start_lr) ** (1.0 / warmup_steps)
    warm = warmup_start_lr * wf**step
    frac = 1.0 - (step - warmup_steps) / float(max_iter - warmup_steps)
    poly = lr0 * jnp.maximum(frac, 0.0) ** power
    return jnp.where(step <= warmup_steps, warm, poly)


def _is_lr_mul(path: tuple) -> bool:
    """The output heads get 10× LR (`model.py get_params` routes FFM +
    output-head params to lr_mul groups; `optimizer.py:53-57`)."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    return any(k in ("out", "out16", "out32", "ffm") for k in keys)


def _is_no_wd(path: tuple, leaf) -> bool:
    """No weight decay for BN scale/bias and biases (`optimizer.py:29-33`)."""
    keys = [getattr(p, "key", None) for p in path]
    return "bn" in keys or keys[-1] in ("scale", "bias", "mean", "var")


@dataclasses.dataclass
class FaceParsingTrainConfig:
    lr0: float = 1e-2
    momentum: float = 0.9
    weight_decay: float = 5e-4
    warmup_steps: int = 1000
    warmup_start_lr: float = 1e-5
    max_iter: int = 80_000
    power: float = 0.9
    ohem_thresh: float = 0.7
    crop_size: int = 448
    batch_size: int = 16


def make_face_parsing_optimizer(cfg: FaceParsingTrainConfig, params: Params):
    """SGD+momentum, per-group weight decay and 10× lr_mul, poly schedule."""

    lr_mul = jax.tree_util.tree_map_with_path(
        lambda p, x: 10.0 if _is_lr_mul(p) else 1.0, params)
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda p, x: not _is_no_wd(p, x), params)

    def schedule(step):
        return warmup_poly_lr(
            step, cfg.lr0, cfg.warmup_steps, cfg.warmup_start_lr,
            cfg.max_iter, cfg.power)

    def scale_by_lr_mul():
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            return jax.tree_util.tree_map(
                lambda u, m: u * m, updates, lr_mul), state

        return optax.GradientTransformation(init, update)

    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        optax.trace(decay=cfg.momentum, nesterov=False),
        scale_by_lr_mul(),
        optax.scale_by_learning_rate(schedule),
    )


# ---------------------------------------------------------------------------
# Train step (`face_parsing/train.py:95-141`)
# ---------------------------------------------------------------------------


def face_parsing_loss(params: Params, images: jax.Array, labels: jax.Array,
                      cfg: FaceParsingTrainConfig):
    """Main + 2 aux OHEM losses, equally weighted (`train.py:118-121`)."""
    out, out16, out32 = bisenet_forward(params, images, train=True)
    n_min = images.shape[0] * cfg.crop_size**2 // 16
    l_main = ohem_ce_loss(out, labels, cfg.ohem_thresh, n_min)
    l_16 = ohem_ce_loss(out16, labels, cfg.ohem_thresh, n_min)
    l_32 = ohem_ce_loss(out32, labels, cfg.ohem_thresh, n_min)
    loss = l_main + l_16 + l_32
    return loss, {"loss": loss, "loss_main": l_main,
                  "loss_aux16": l_16, "loss_aux32": l_32}


def make_face_parsing_train_step(cfg: FaceParsingTrainConfig, optimizer):
    @jax.jit
    def step(params, opt_state, images, labels):
        (loss, metrics), grads = jax.value_and_grad(
            face_parsing_loss, has_aux=True)(params, images, labels, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# Data augmentation (`face_parsing/transform.py`, `face_dataset.py`)
# ---------------------------------------------------------------------------


def augment_face_parsing(
    img: np.ndarray,  # [H, W, 3] uint8
    label: np.ndarray,  # [H, W] uint8
    rng: np.random.Generator,
    crop_size: int = 448,
    scales=(0.75, 1.0, 1.25, 1.5, 1.75, 2.0),
    brightness: float = 0.5,
    contrast: float = 0.5,
    saturation: float = 0.5,
):
    """RandomScale → RandomCrop → HorizontalFlip → ColorJitter, the
    composition in `face_dataset.py:34-44` (p_flip=0.5, jitter 0.5)."""
    from PIL import Image

    scale = float(rng.choice(np.asarray(scales)))
    w, h = int(img.shape[1] * scale), int(img.shape[0] * scale)
    im = Image.fromarray(img).resize((w, h), Image.BILINEAR)
    lb = Image.fromarray(label).resize((w, h), Image.NEAREST)

    # pad if needed, then random crop
    pad_w, pad_h = max(crop_size - w, 0), max(crop_size - h, 0)
    if pad_w or pad_h:
        im2 = Image.new("RGB", (w + pad_w, h + pad_h))
        im2.paste(im, (0, 0))
        lb2 = Image.new("L", (w + pad_w, h + pad_h), IGNORE_LABEL)
        lb2.paste(lb, (0, 0))
        im, lb, w, h = im2, lb2, w + pad_w, h + pad_h
    x0 = int(rng.integers(0, w - crop_size + 1))
    y0 = int(rng.integers(0, h - crop_size + 1))
    box = (x0, y0, x0 + crop_size, y0 + crop_size)
    im, lb = im.crop(box), lb.crop(box)

    if rng.random() < 0.5:
        im = im.transpose(Image.FLIP_LEFT_RIGHT)
        lb = lb.transpose(Image.FLIP_LEFT_RIGHT)

    arr = np.asarray(im).astype(np.float32)
    # ColorJitter: brightness/contrast/saturation each ~U[1-r, 1+r]
    fb = float(rng.uniform(max(0, 1 - brightness), 1 + brightness))
    fc = float(rng.uniform(max(0, 1 - contrast), 1 + contrast))
    fs = float(rng.uniform(max(0, 1 - saturation), 1 + saturation))
    arr = arr * fb
    mean = arr.mean()
    arr = (arr - mean) * fc + mean
    gray = arr @ np.asarray([0.299, 0.587, 0.114], np.float32)
    arr = (arr - gray[..., None]) * fs + gray[..., None]
    arr = np.clip(arr, 0, 255)

    # imagenet normalize, CHW (face_dataset.py:30-33)
    arr = arr / 255.0
    arr = (arr - np.asarray([0.485, 0.456, 0.406])) / np.asarray(
        [0.229, 0.224, 0.225])
    return arr.transpose(2, 0, 1).astype(np.float32), np.asarray(
        lb, np.uint8)


class FaceMaskDataset:
    """CelebAMask-HQ-style folder pairs: `images/*.jpg` + `labels/*.png`
    (`face_dataset.py:15-33`)."""

    def __init__(self, root: str, crop_size: int = 448, seed: int = 0):
        import os

        self.img_dir = os.path.join(root, "images")
        self.lbl_dir = os.path.join(root, "labels")
        names = sorted(os.listdir(self.img_dir))
        self.items = [
            (os.path.join(self.img_dir, n),
             os.path.join(self.lbl_dir, os.path.splitext(n)[0] + ".png"))
            for n in names]
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from PIL import Image

        ip, lp = self.items[i]
        img = np.asarray(Image.open(ip).convert("RGB"))
        lbl = np.asarray(Image.open(lp).convert("L"))
        return augment_face_parsing(img, lbl, self.rng, self.crop_size)

    def get_eval(self, i):
        """Deterministic (image, label) pair: resize to crop_size with no
        augmentation/jitter — the standard segmentation-eval protocol."""
        from PIL import Image

        ip, lp = self.items[i]
        s = self.crop_size
        img = Image.open(ip).convert("RGB").resize((s, s), Image.BILINEAR)
        lbl = Image.open(lp).convert("L").resize((s, s), Image.NEAREST)
        arr = np.asarray(img).astype(np.float32) / 255.0
        arr = (arr - np.asarray([0.485, 0.456, 0.406])) / np.asarray(
            [0.229, 0.224, 0.225])
        return (arr.transpose(2, 0, 1).astype(np.float32),
                np.asarray(lbl, np.uint8))

    def batches(self, batch_size: int, steps: int):
        n = len(self.items)
        for _ in range(steps):
            idx = self.rng.integers(0, n, batch_size)
            pairs = [self[int(i)] for i in idx]
            yield (np.stack([p[0] for p in pairs]),
                   np.stack([p[1] for p in pairs]))

    def eval_batches(self, batch_size: int):
        """Sequential full pass, deterministic preprocessing — each image
        seen exactly once, no augmentation (unbiased mIoU/pixel-acc)."""
        for start in range(0, len(self.items), batch_size):
            pairs = [self.get_eval(i)
                     for i in range(start, min(start + batch_size,
                                               len(self.items)))]
            yield (np.stack([p[0] for p in pairs]),
                   np.stack([p[1] for p in pairs]))


# ---------------------------------------------------------------------------
# Evaluation & visualization (`face_parsing/evaluate.py` equivalents)
# ---------------------------------------------------------------------------


def confusion_matrix(pred: "np.ndarray", label: "np.ndarray",
                     n_classes: int = 19) -> "np.ndarray":
    """Accumulate an [C, C] confusion matrix (rows = ground truth)."""
    pred = np.asarray(pred).reshape(-1)
    label = np.asarray(label).reshape(-1)
    valid = label < n_classes
    idx = label[valid].astype(np.int64) * n_classes + pred[valid].astype(
        np.int64)
    return np.bincount(idx, minlength=n_classes * n_classes).reshape(
        n_classes, n_classes)


def miou_from_confusion(cm: "np.ndarray") -> dict:
    """Per-class IoU + mean IoU + pixel accuracy from a confusion matrix."""
    cm = cm.astype(np.float64)
    tp = np.diag(cm)
    union = cm.sum(0) + cm.sum(1) - tp
    iou = np.where(union > 0, tp / np.maximum(union, 1), np.nan)
    present = union > 0
    return {
        "per_class_iou": iou,
        "miou": float(np.nanmean(iou[present])) if present.any() else 0.0,
        "pixel_acc": float(tp.sum() / max(cm.sum(), 1)),
    }


def evaluate_face_parsing(params: Params, dataset: "FaceMaskDataset",
                          batch_size: int = 8, max_batches: int | None = None,
                          n_classes: int = 19) -> dict:
    """mIoU of a BiSeNet over held-out (image, label) pairs. The reference's
    `face_parsing/evaluate.py` only renders overlays; we additionally report
    the standard segmentation metrics so parsing training is gateable.

    Uses `dataset.eval_batches`: one sequential full pass with deterministic
    resize (no jitter/flip/random-crop), so every image is counted exactly
    once and the metric is unbiased. `max_batches` optionally truncates the
    pass for smoke runs."""
    from adaface_tpu.models.bisenet import bisenet_forward

    fwd = jax.jit(lambda p, x: jnp.argmax(bisenet_forward(p, x), axis=1))
    cm = np.zeros((n_classes, n_classes), np.int64)
    for bi, (images, labels) in enumerate(dataset.eval_batches(batch_size)):
        pred = np.asarray(fwd(params, jnp.asarray(images)))
        cm += confusion_matrix(pred, labels, n_classes)
        if max_batches is not None and bi + 1 >= max_batches:
            break
    return miou_from_confusion(cm)


def parsing_palette(n_classes: int = 19) -> "np.ndarray":
    """[C, 3] uint8 colors: background black, parts maximally-spaced hues."""
    import colorsys

    colors = [(0, 0, 0)]
    for i in range(1, n_classes):
        # golden-ratio hue walk → visually distinct neighbor classes
        h = (i * 0.61803398875) % 1.0
        s = 0.85 if i % 2 else 0.6
        r, g, b = colorsys.hsv_to_rgb(h, s, 1.0)
        colors.append((int(r * 255), int(g * 255), int(b * 255)))
    return np.asarray(colors, np.uint8)


def colorize_parsing(parsing: "np.ndarray", n_classes: int = 19) -> "np.ndarray":
    """[H, W] int parsing map → [H, W, 3] uint8 color map."""
    return parsing_palette(n_classes)[np.clip(parsing, 0, n_classes - 1)]


def overlay_parsing(image: "np.ndarray", parsing: "np.ndarray",
                    alpha: float = 0.6) -> "np.ndarray":
    """Blend a parsing color map over an RGB uint8 image
    (`vis_parsing_maps`, `face_parsing/evaluate.py:25-60`: 0.4 image +
    0.6 colored annotation)."""
    color = colorize_parsing(parsing).astype(np.float32)
    out = image.astype(np.float32) * (1 - alpha) + color * alpha
    return np.clip(out, 0, 255).astype(np.uint8)
