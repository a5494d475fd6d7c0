"""Three-phase comp-distill detection choreography (callback-less
backends): collect1 → host detect → collect2 (redenoise) → host detect →
train must equal the single-graph pure_callback mode exactly, because the
axon PJRT relay rejects host callbacks and the real chip trains comp
iterations through this path (`make_three_phase_comp_step`)."""

import jax
import numpy as np

from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.train.comp_step import (CompDistillConfig,
                                         comp_detections_to_batch,
                                         comp_distill_loss_fn,
                                         make_three_phase_comp_step)
from adaface_tpu.train.face_detect import HostFaceDetector
from adaface_tpu.train.train_step import TrainConfig

from tests.test_comp_face_align import VAE_CFG, _center_detector, _face_setup
from tests.test_train import CLIP_CFG, SBG_CFG, UNET_CFG


def _cfg():
    return TrainConfig(unet=UNET_CFG, sbg=SBG_CFG, clip_text=CLIP_CFG,
                       training_perturb_prob=0.0)


def _ccfg():
    return CompDistillConfig(
        num_priming_steps=2, num_denoising_steps=2, compute_dtype="float32",
        vae_cfg=VAE_CFG)


def test_three_phase_matches_callback_mode():
    frozen, trainable, batch = _face_setup(b=1)
    det = HostFaceDetector(detector_fn=_center_detector)
    sched = DiffusionSchedule.create()
    cfg, ccfg = _cfg(), _ccfg()
    rng = jax.random.PRNGKey(0)

    # single-graph callback mode (the CPU-mesh/golden path)
    l1, m1 = comp_distill_loss_fn(trainable, frozen, batch, sched, cfg, rng,
                                  comp_cfg=ccfg, detector=det)

    # phase 1: collect decoded pixels, no callbacks
    _, aux1 = comp_distill_loss_fn(trainable, frozen, batch, sched, cfg, rng,
                                   comp_cfg=ccfg, detector=None,
                                   stage="collect1")
    px = aux1["comp_px"]
    sc = np.asarray(px["sc"])
    s_steps, b = sc.shape[0], sc.shape[1]
    assert s_steps == ccfg.num_denoising_steps
    d_ssmc = det(np.asarray(px["ssmc"]))
    d_sc = det(sc.reshape(s_steps * b, *sc.shape[2:]))

    # phase 2: redenoise with round-1 detections, collect its pixels
    batch2 = dict(batch, comp_face_dets=comp_detections_to_batch(
        d_ssmc, d_sc, None, s_steps, b, det.max_bg))
    _, aux2 = comp_distill_loss_fn(trainable, frozen, batch2, sched, cfg, rng,
                                   comp_cfg=ccfg, detector=None,
                                   stage="collect2")
    ss2 = np.asarray(aux2["ss2_px"])
    assert ss2.shape[0] == s_steps * b
    d_ss2 = det(ss2)

    # phase 3: full loss with both detection sets as data
    batch3 = dict(batch, comp_face_dets=comp_detections_to_batch(
        d_ssmc, d_sc, d_ss2, s_steps, b, det.max_bg))
    l3, m3 = comp_distill_loss_fn(trainable, frozen, batch3, sched, cfg, rng,
                                  comp_cfg=ccfg, detector=None)

    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-5)
    for k in ("loss_arcface_align_comp", "comp_sc_face_detected",
              "comp_ss_redenoise_success_frac", "loss_comp_fg_bg_preserve"):
        np.testing.assert_allclose(float(m1[k]), float(m3[k]), rtol=1e-5,
                                   err_msg=k)


def test_make_three_phase_comp_step_runs():
    from adaface_tpu.train.optimizers import make_optimizer
    from adaface_tpu.train.train_step import init_state, make_train_step

    frozen, trainable, batch = _face_setup(b=1)
    det = HostFaceDetector(detector_fn=_center_detector)
    sched = DiffusionSchedule.create()
    cfg, ccfg = _cfg(), _ccfg()
    opt = make_optimizer("adamw", 1e-3)
    state = init_state(trainable, opt)

    run = make_three_phase_comp_step(ccfg, det, opt, frozen, sched, cfg)
    state2, metrics = run(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # must equal the single-graph step driven with the in-graph callback
    loss_fn = lambda *a: comp_distill_loss_fn(  # noqa: E731
        *a, comp_cfg=ccfg, detector=det)
    step = make_train_step(loss_fn, opt, frozen, sched, cfg, donate=False)
    _, metrics_cb = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_cb["loss"]), rtol=1e-5)


def test_three_phase_dp_tp_mesh_matches_single_device():
    """The comp three-phase step over a dp=4 × tp=2 mesh must equal the
    single-device callback-mode step (VERDICT r3 #5: this graph's mesh
    path was exercised only by the driver dryrun before; mirrors
    test_recon_step.test_recon_v2_dp_mesh_matches_single_device)."""
    from adaface_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from adaface_tpu.train.optimizers import make_optimizer
    from adaface_tpu.train.train_step import init_state, make_train_step

    frozen, trainable, batch = _face_setup(b=4)
    det = HostFaceDetector(detector_fn=_center_detector)
    sched = DiffusionSchedule.create()
    cfg, ccfg = _cfg(), _ccfg()
    opt = make_optimizer("adamw", 1e-3)
    state = init_state(trainable, opt)
    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        frozen_sharded = {
            k: (shard_params(v, mesh) if k in ("unet", "text_encoder")
                else v)
            for k, v in frozen.items()}
        sharded = shard_batch(batch, mesh)
        run = make_three_phase_comp_step(ccfg, det, opt, frozen_sharded,
                                         sched, cfg)
        _, metrics = run(state, sharded, jax.random.PRNGKey(1))
        mesh_loss = float(metrics["loss"])
    assert np.isfinite(mesh_loss)
    loss_fn = lambda *a: comp_distill_loss_fn(  # noqa: E731
        *a, comp_cfg=ccfg, detector=det)
    step = make_train_step(loss_fn, opt, frozen, sched, cfg, donate=False)
    _, metrics_cb = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(mesh_loss, float(metrics_cb["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        float(metrics["loss_arcface_align_comp"]),
        float(metrics_cb["loss_arcface_align_comp"]), rtol=1e-4)
