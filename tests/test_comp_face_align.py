"""Tests for the comp-iteration identity losses + SS re-denoise
(train/comp_face_align.py ≡ `calc_comp_face_align_and_mb_suppress_losses`
`ddpm.py:3602-3733`, proportion gating `ddpm.py:3337-3464`, and
`redenoise_subj_single` `ddpm.py:2093-2266`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.arcface import init_arcface_params
from adaface_tpu.models.vae import VAEConfig, init_vae_params
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.train.comp_face_align import (
    PROPORTION_TYPES,
    classify_sc_face_proportion,
    paste_resized_crop,
)
from adaface_tpu.train.comp_step import CompDistillConfig, comp_distill_loss_fn
from adaface_tpu.train.face_detect import HostFaceDetector
from adaface_tpu.train.train_step import TrainConfig

from tests.test_comp_distill import make_comp_batch
from tests.test_train import CLIP_CFG, HW, SBG_CFG, UNET_CFG, _setup

VAE_CFG = VAEConfig(base_ch=16, ch_mult=(1, 2, 2), num_res_blocks=1,
                    norm_groups=8)


# ---------------------------------------------------------------- geometry

def test_paste_resized_crop_pastes_resized_region():
    b, c = 1, 2
    src = jnp.arange(64.0).reshape(1, 1, 8, 8)
    src = jnp.tile(src, (b, c, 1, 1))
    dst = jnp.zeros((b, c, 8, 8))
    # paste src's [0:4, 0:4] region (resized to 2x2) at dst [6:8, 6:8]
    out = paste_resized_crop(
        dst, jnp.asarray([[6.0, 6.0, 8.0, 8.0]]),
        src, jnp.asarray([[0.0, 0.0, 4.0, 4.0]]),
        mix_weights=(1.0, 0.0, 0.0))
    out = np.asarray(out)
    # outside the dst box: untouched
    assert (out[0, 0, :6, :] == 0).all() and (out[0, 0, :, :6] == 0).all()
    # inside: bilinear downsample of the src 4x4 region (align_corners=False
    # for 4->2: samples at src coords 0.5 and 2.5)
    want = np.asarray([[np.mean([0, 1, 8, 9]), np.mean([2, 3, 10, 11])],
                       [np.mean([16, 17, 24, 25]), np.mean([18, 19, 26, 27])]])
    np.testing.assert_allclose(out[0, 0, 6:, 6:], want, atol=1e-5)


def test_paste_identity_when_same_boxes_full_weight():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 8, 8))
    bb = jnp.tile(jnp.asarray([[1.0, 2.0, 6.0, 7.0]]), (2, 1))
    out = paste_resized_crop(x, bb, x, bb, mix_weights=(1.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


# ---------------------------------------------------- proportion classifier

def test_classify_sc_face_proportion_branches():
    def cls(sc, mc, ov):
        oh = np.asarray(classify_sc_face_proportion(
            jnp.float32(sc), jnp.float32(mc), jnp.float32(ov)))
        return PROPORTION_TYPES[int(oh.argmax())]

    assert cls(0.0, 0.0, 0.0) == "sc-noface"
    assert cls(0.16 * 0.36 + 0.01, 0.0, 0.0) == "mc-no-sc-large"
    assert cls(0.1, 0.05, 0.1) == "little-no-overlap"
    assert cls(0.01, 0.05, 0.5) == "too-small"
    assert cls(0.4, 0.05, 0.5) == "too-large"
    assert cls(0.32, 0.05, 0.5) == "too-large"  # sc >= 6.25*mc
    assert cls(0.2, 0.05, 0.5) == "good"
    assert cls(0.1, 0.05, 0.5) == "good"
    # small sc face with no mc face is allowed ('too-small', not suppressed)
    assert cls(0.01, 0.0, 0.0) == "too-small"


# ------------------------------------------------------------- end-to-end

def _face_setup(b=1):
    frozen, trainable, _ = _setup(b=b)
    rng = jax.random.PRNGKey(7)
    frozen["vae"] = init_vae_params(jax.random.fold_in(rng, 1), VAE_CFG)
    frozen["arcface"] = init_arcface_params(jax.random.fold_in(rng, 2),
                                            use_se=False)
    batch = make_comp_batch(b=b)
    px = HW * VAE_CFG.spatial_scale
    batch["ref_images"] = jnp.clip(jax.random.normal(
        jax.random.fold_in(rng, 3), (b, 3, px, px)) * 0.3, -1, 1)
    batch["ref_face_bboxes"] = jnp.tile(
        jnp.asarray([[8.0, 8.0, 40.0, 40.0]]), (b, 1))
    batch["ref_face_detected"] = jnp.ones((b,))
    batch["comp_sc_face_detected_mean"] = jnp.float32(0.9)
    batch["comp_sc_face_detected_n"] = jnp.float32(10.0)
    return frozen, trainable, batch


def _center_detector(img):
    h, w = img.shape[:2]
    q = 0.25
    return [(np.asarray((w * q, h * q, w * (1 - q), h * (1 - q)),
                        np.float32), 1.0)]


def test_comp_loss_with_identity_family_runs_and_grads():
    frozen, trainable, batch = _face_setup(b=1)
    det = HostFaceDetector(detector_fn=_center_detector)
    sched = DiffusionSchedule.create()
    cfg = TrainConfig(unet=UNET_CFG, sbg=SBG_CFG, clip_text=CLIP_CFG,
                      training_perturb_prob=0.0)
    comp_cfg = CompDistillConfig(num_priming_steps=1, num_denoising_steps=2,
                                 compute_dtype="float32", vae_cfg=VAE_CFG,
                                 comp_sc_face_align_loss_thres=-1.0)
    (loss, metrics), grads = jax.value_and_grad(
        comp_distill_loss_fn, has_aux=True)(
        trainable, frozen, batch, sched, cfg, jax.random.PRNGKey(0),
        comp_cfg, det)
    assert np.isfinite(float(loss))
    # the align family fired: every instance face is detected at conf 1.0
    assert float(metrics["loss_arcface_align_comp"]) > 0
    assert float(metrics["comp_sc_face_detected"]) == 1.0
    assert float(metrics["comp_mc_face_detected"]) == 1.0
    assert float(metrics["sc_fg_mask_percent"]) > 0
    assert float(metrics["comp_ss_redenoise_success_frac"]) >= 0
    # detection-aware frac update: (0.9*10 + 1)/11
    np.testing.assert_allclose(float(metrics["comp_sc_face_detected_frac"]),
                               (0.9 * 10 + 1) / 11, rtol=1e-5)
    g = sum(float(jnp.abs(x).sum())
            for x in jax.tree_util.tree_leaves(grads["sbg"]))
    assert g > 0
    # identity terms shape the gradient: rerun without the face towers
    frozen_no = {k: v for k, v in frozen.items()
                 if k not in ("arcface", "vae")}
    (_, m2), g2 = jax.value_and_grad(comp_distill_loss_fn, has_aux=True)(
        trainable, frozen_no, batch, sched, cfg, jax.random.PRNGKey(0),
        comp_cfg, det)
    assert "loss_arcface_align_comp" not in m2
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(grads["sbg"]),
        jax.tree_util.tree_leaves(g2["sbg"])))
    assert diff > 0


def test_comp_loss_no_faces_detected_gates_align_family_off():
    frozen, trainable, batch = _face_setup(b=1)
    det = HostFaceDetector(detector_fn=lambda img: [])
    sched = DiffusionSchedule.create()
    cfg = TrainConfig(unet=UNET_CFG, sbg=SBG_CFG, clip_text=CLIP_CFG,
                      training_perturb_prob=0.0)
    comp_cfg = CompDistillConfig(num_priming_steps=1, num_denoising_steps=2,
                                 compute_dtype="float32", vae_cfg=VAE_CFG)
    loss, metrics = comp_distill_loss_fn(
        trainable, frozen, batch, sched, cfg, jax.random.PRNGKey(0),
        comp_cfg, det)
    assert np.isfinite(float(loss))
    assert float(metrics["loss_arcface_align_comp"]) == 0.0
    assert float(metrics["comp_sc_face_detected"]) == 0.0
    assert float(metrics["sc_fg_mask_percent"]) == 0.0
    # sc-noface → fg_bg_preserve fully gated off
    assert float(metrics["sc_face_proportion_type"]) == 0.0
    assert float(metrics["loss_comp_fg_bg_preserve"]) == 0.0
    # rolling frac decays: (0.9*10 + 0)/11
    np.testing.assert_allclose(float(metrics["comp_sc_face_detected_frac"]),
                               9.0 / 11, rtol=1e-5)
