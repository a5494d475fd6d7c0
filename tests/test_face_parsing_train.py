"""Face-parsing training path: OHEM loss, poly LR, one full train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.train.face_parsing_train import (
    FaceParsingTrainConfig, augment_face_parsing, face_parsing_loss,
    make_face_parsing_optimizer, make_face_parsing_train_step, ohem_ce_loss,
    softmax_focal_loss, warmup_poly_lr)


def _naive_ohem(logits, labels, thresh, n_min, ignore=255):
    """Direct port of the reference algorithm (`face_parsing/loss.py:20-27`)
    in numpy as the oracle."""
    b, c, h, w = logits.shape
    logits = np.asarray(logits, np.float64)
    lbl = np.asarray(labels)
    logp = logits - np.log(
        np.exp(logits - logits.max(1, keepdims=True)).sum(1, keepdims=True)
    ) - logits.max(1, keepdims=True)
    nll = np.zeros((b, h, w))
    for bi in range(b):
        for yi in range(h):
            for xi in range(w):
                if lbl[bi, yi, xi] != ignore:
                    nll[bi, yi, xi] = -logp[bi, lbl[bi, yi, xi], yi, xi]
    flat = np.sort(nll.reshape(-1))[::-1]
    th = -np.log(thresh)
    if flat[n_min] > th:
        kept = flat[flat > th]
    else:
        kept = flat[:n_min]
    return kept.mean()


def test_ohem_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8)).astype(np.int32)
    labels[0, :2] = 255  # ignored region
    for n_min in (5, 40, 120):
        got = float(ohem_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 thresh=0.7, n_min=n_min))
        want = _naive_ohem(logits, labels, 0.7, n_min)
        assert abs(got - want) < 2e-4, (n_min, got, want)


def test_ohem_all_ignored_is_finite():
    logits = jnp.zeros((1, 3, 4, 4))
    labels = jnp.full((1, 4, 4), 255, jnp.int32)
    assert np.isfinite(float(ohem_ce_loss(logits, labels, n_min=4)))


def test_focal_loss_matches_ce_at_gamma0():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 4, 4)), jnp.int32)
    fl = float(softmax_focal_loss(logits, labels, gamma=0.0))
    logp = jax.nn.log_softmax(logits, axis=1)
    ce = float(-jnp.take_along_axis(logp, labels[:, None], 1).mean())
    assert abs(fl - ce) < 1e-5


def test_warmup_poly_lr_shape():
    # warmup: exponential from warmup_start_lr to lr0
    lr_start = float(warmup_poly_lr(0, lr0=1e-2, warmup_steps=100,
                                    warmup_start_lr=1e-5, max_iter=1000))
    lr_end_warm = float(warmup_poly_lr(100, lr0=1e-2, warmup_steps=100,
                                       warmup_start_lr=1e-5, max_iter=1000))
    assert abs(lr_start - 1e-5) < 1e-9
    assert abs(lr_end_warm - 1e-2) < 1e-6
    # poly decay afterwards, → 0 at max_iter
    lr_mid = float(warmup_poly_lr(550, lr0=1e-2, warmup_steps=100,
                                  warmup_start_lr=1e-5, max_iter=1000))
    lr_last = float(warmup_poly_lr(1000, lr0=1e-2, warmup_steps=100,
                                   warmup_start_lr=1e-5, max_iter=1000))
    assert 0 < lr_mid < 1e-2 and lr_last < 1e-6


def test_train_step_runs_and_improves():
    from adaface_tpu.models.bisenet import init_bisenet_params

    cfg = FaceParsingTrainConfig(crop_size=64, batch_size=2, lr0=5e-2,
                                 warmup_steps=2, warmup_start_lr=1e-2,
                                 max_iter=50)
    params = init_bisenet_params(jax.random.PRNGKey(0))
    opt = make_face_parsing_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_face_parsing_train_step(cfg, opt)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 3, 64, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 19, size=(2, 64, 64)), jnp.int32)

    l0 = float(face_parsing_loss(params, images, labels, cfg)[0])
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, images, labels)
    l1 = float(metrics["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0  # overfits the fixed batch


def test_augmentation_shapes_and_range():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(100, 120, 3)).astype(np.uint8)
    lbl = rng.integers(0, 19, size=(100, 120)).astype(np.uint8)
    chw, out_lbl = augment_face_parsing(img, lbl, rng, crop_size=64)
    assert chw.shape == (3, 64, 64) and out_lbl.shape == (64, 64)
    # labels are either valid classes or the pad ignore value
    assert set(np.unique(out_lbl)) <= set(range(19)) | {255}


def test_confusion_miou_and_overlay():
    from adaface_tpu.train.face_parsing_train import (
        colorize_parsing, confusion_matrix, miou_from_confusion,
        overlay_parsing)

    pred = np.array([0, 1, 1, 2, 2, 2])
    label = np.array([0, 1, 2, 2, 2, 255])  # 255 = ignore
    cm = confusion_matrix(pred, label, n_classes=3)
    assert cm.sum() == 5  # ignore pixel dropped
    m = miou_from_confusion(cm)
    assert m["per_class_iou"][0] == 1.0
    assert 0.0 < m["miou"] <= 1.0
    assert m["pixel_acc"] == 4 / 5

    # perfect prediction → mIoU 1
    cm2 = confusion_matrix(label[:5], label[:5], n_classes=3)
    assert miou_from_confusion(cm2)["miou"] == 1.0

    parsing = np.zeros((8, 8), np.int64)
    parsing[2:6, 2:6] = 5
    color = colorize_parsing(parsing)
    assert color.shape == (8, 8, 3)
    assert (color[0, 0] == 0).all()  # background black
    assert (color[3, 3] != color[0, 0]).any()
    img = np.full((8, 8, 3), 200, np.uint8)
    vis = overlay_parsing(img, parsing, alpha=0.6)
    assert vis.shape == (8, 8, 3) and vis.dtype == np.uint8
    # background pixels = 0.4 * image
    assert abs(int(vis[0, 0, 0]) - 80) <= 1


def test_evaluate_face_parsing_on_synthetic_dataset(tmp_path):
    from PIL import Image

    from adaface_tpu.models.bisenet import init_bisenet_params
    from adaface_tpu.train.face_parsing_train import (
        FaceMaskDataset, evaluate_face_parsing)

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, size=(72, 72, 3)).astype(np.uint8)
        lbl = rng.integers(0, 19, size=(72, 72)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"{i}.jpg")
        Image.fromarray(lbl).save(tmp_path / "labels" / f"{i}.png")

    ds = FaceMaskDataset(str(tmp_path), crop_size=64)
    params = init_bisenet_params(jax.random.PRNGKey(0))
    m = evaluate_face_parsing(params, ds, batch_size=2, max_batches=1)
    assert 0.0 <= m["miou"] <= 1.0 and 0.0 <= m["pixel_acc"] <= 1.0
    assert m["per_class_iou"].shape == (19,)
