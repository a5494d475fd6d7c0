"""Training-step throughput benchmark at real SD1.5 sizes.

The reference's only published performance number is training cost:
stage-1 = 120k steps in 1-2 days on 2x RTX A6000 at bs4/GPU
(`/root/reference/README.md:72` via BASELINE.md) — i.e. ~0.7-1.4
optimizer steps/sec for the 2-GPU machine, ~0.35-0.7 steps/sec/GPU.

Measures the LIVE normal-recon iteration (train/recon_step.py): 2-step
CFG denoise + cls anchor + in-graph VAE decode + ArcFace identity loss +
CAdamW update at bs4, via the two-phase detection choreography the real
chip uses (the axon relay rejects host callbacks): phase A = no-grad
collect pass (decoded recons), host detection, phase B = the train step
consuming precomputed detections.

The relay dies silently on a second large compile in one process
(measured, .claude/skills/verify), so the two graphs compile in separate
subprocesses chained through /tmp state:

  python scripts/bench_train.py            # orchestrates both phases
  python scripts/bench_train.py collect    # phase A only
  python scripts/bench_train.py train      # phase B only (needs A's npz)
  python scripts/bench_train.py legacy     # old single-step recon graph

Prints ONE JSON line per completed benchmark.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_TRAIN_BS", "4"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "3"))
STATE = os.environ.get("BENCH_TRAIN_STATE", "/tmp/bench_train_state.npz")

# reference: 120k steps / 1.5 days avg on 2 GPUs -> per-GPU steps/sec at bs4
REF_STEPS_PER_SEC_PER_GPU = 120_000 / (1.5 * 86400) / 2


def _sync(out):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


def _build(full: bool):
    """Shared setup → (step pieces). full=True loads the VAE+ArcFace
    towers for the identity-loss path."""
    import jax
    import jax.numpy as jnp

    from adaface_tpu.id2ada.subj_basis_generator import (
        SubjBasisConfig, init_subj_basis_generator)
    from adaface_tpu.models.clip import CLIP_L_TEXT, init_text_params
    from adaface_tpu.models.unet import SD15_UNET, init_unet_params
    from adaface_tpu.ops.schedules import DiffusionSchedule
    from adaface_tpu.text.embedding_manager import (EmbeddingManager,
                                                    PlaceholderSpec)
    from adaface_tpu.text.tokenizer import default_tokenizer
    from adaface_tpu.train.optimizers import make_optimizer
    from adaface_tpu.train.prompt_batch import build_4block_prompt_batch
    from adaface_tpu.train.train_step import TrainConfig, init_state

    k_id = 16
    sbg_cfg = SubjBasisConfig(num_id_vecs=k_id)
    rng = jax.random.PRNGKey(0)
    tok = default_tokenizer()

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sbg = init_subj_basis_generator(jax.random.fold_in(rng, 1), sbg_cfg,
                                        tokenizer=tok)
        frozen_host = {
            "unet": init_unet_params(jax.random.fold_in(rng, 2), SD15_UNET),
            "text_encoder": init_text_params(jax.random.fold_in(rng, 3),
                                             CLIP_L_TEXT),
        }
        if full:
            from adaface_tpu.models.arcface import init_arcface_params
            from adaface_tpu.models.vae import init_vae_params

            frozen_host["vae"] = init_vae_params(jax.random.fold_in(rng, 4))
            frozen_host["arcface"] = init_arcface_params(
                jax.random.fold_in(rng, 5))
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    dev = jax.devices()[0]
    frozen = {k: jax.device_put(bf16(v) if k != "arcface" else v, dev)
              for k, v in frozen_host.items()}
    frozen["sbg_buffers"] = sbg["buffers"]
    trainable = jax.device_put({"sbg": sbg["params"]}, dev)

    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    ph = em.expand_placeholder(em.placeholders[0])
    pb = build_4block_prompt_batch(
        em,
        [f"a photo of {ph}"] * BATCH,
        [f"a photo of {ph} riding a bike"] * BATCH,
        ["a photo of person"] * BATCH,
        ["a photo of person riding a bike"] * BATCH,
    )
    key = jax.random.PRNGKey(7)
    hw = 64
    batch_dev = {
        "x_start": jax.random.normal(jax.random.fold_in(key, 0),
                                     (BATCH, 4, hw, hw)),
        "noise": jax.random.normal(jax.random.fold_in(key, 1),
                                   (BATCH, 4, hw, hw)),
        "t": jnp.full((BATCH,), 500, jnp.int32),
        "img_prompt_embs": jax.random.normal(jax.random.fold_in(key, 2),
                                             (BATCH, k_id, 768)),
        "prompt_ids": jnp.asarray(pb["prompt_ids"]),
        "splice_map": jnp.asarray(pb["splice_map"]),
        "prompt_emb_mask": jnp.asarray(pb["prompt_emb_mask"]),
        "uncond_ids": jnp.asarray(pb["uncond_ids"]),
        "img_mask": jnp.ones((BATCH, 1, hw, hw)),
        "fg_mask": jnp.ones((BATCH, 1, hw, hw)),
        "face_detected": jnp.ones((BATCH,)),
    }
    if full:
        batch_dev.update({
            "ref_images": jnp.clip(jax.random.normal(
                jax.random.fold_in(key, 3), (BATCH, 3, 512, 512)) * 0.3,
                -1, 1),
            "ref_face_bboxes": jnp.tile(
                jnp.asarray([[128.0, 128.0, 384.0, 384.0]]), (BATCH, 1)),
            "ref_face_detected": jnp.ones((BATCH,)),
            "recon_attn_lora_gate": jnp.float32(0.0),
        })
    batch_dev = jax.device_put(batch_dev, dev)

    sched = DiffusionSchedule.create()
    cfg = TrainConfig(unet=SD15_UNET, sbg=sbg_cfg, clip_text=CLIP_L_TEXT,
                      training_perturb_prob=0.0)
    opt = make_optimizer("cadamw", 1e-3)
    state = init_state(trainable, opt)
    return frozen, trainable, batch_dev, sched, cfg, opt, state


def phase_collect():
    import jax
    import numpy as np

    from adaface_tpu.train.face_detect import HostFaceDetector
    from adaface_tpu.train.recon_step import ReconStepConfig, recon_loss_fn_v2
    from adaface_tpu.train.train_step import make_frozen_caller

    frozen, trainable, batch, sched, cfg, opt, state = _build(full=True)
    rcfg = ReconStepConfig()
    collect = make_frozen_caller(
        lambda frozen_, params, b, rng: recon_loss_fn_v2(
            params, frozen_, b, sched, cfg, rng, rcfg=rcfg,
            detector=None, collect_mode=True)[1]["recon_px"], frozen)

    t0 = time.perf_counter()
    px = collect(state.params, batch, jax.random.PRNGKey(0))
    _sync(px)
    print(f"# collect compile+first: {time.perf_counter()-t0:.1f}s "
          f"px={px.shape}", file=sys.stderr)

    det = HostFaceDetector()  # cascade/insightface if present; else none
    times, det_times, saved = [], [], {}
    for i in range(ITERS):
        t0 = time.perf_counter()
        px = collect(state.params, batch, jax.random.PRNGKey(i))
        flat = np.asarray(px).reshape(-1, *px.shape[2:])
        times.append(time.perf_counter() - t0)
        t1 = time.perf_counter()
        d = det(flat)
        det_times.append(time.perf_counter() - t1)
        saved[f"fg_{i}"] = d.fg_bboxes
        saved[f"det_{i}"] = d.detected
        saved[f"conf_{i}"] = d.confidences
        saved[f"bgb_{i}"] = d.bg_bboxes
        saved[f"bgv_{i}"] = d.bg_valid
    saved["collect_time"] = np.float64(np.median(times))
    saved["detect_time"] = np.float64(np.median(det_times))
    saved["s_steps"] = np.int64(px.shape[0])
    np.savez(STATE, **saved)
    print(json.dumps({
        "metric": "recon_collect_phase",
        "value": round(float(np.median(times)), 3),
        "unit": f"sec@bs{BATCH}",
        "detect_sec": round(float(np.median(det_times)), 4),
    }))


def phase_train():
    import jax
    import numpy as np

    from adaface_tpu.train.recon_step import (
        ReconStepConfig, detections_to_batch, make_recon_loss_fn)
    from adaface_tpu.train.train_step import make_train_step

    frozen, trainable, batch, sched, cfg, opt, state = _build(full=True)
    rcfg = ReconStepConfig()
    loss_fn = make_recon_loss_fn(rcfg, None)
    step = make_train_step(loss_fn, opt, frozen, sched, cfg, donate=False)

    data = np.load(STATE)
    s_steps = int(data["s_steps"])

    class D:
        pass

    def dets_for(i):
        d = D()
        d.fg_bboxes = data[f"fg_{i}"]
        d.detected = data[f"det_{i}"]
        d.confidences = data[f"conf_{i}"]
        d.bg_bboxes = data[f"bgb_{i}"]
        d.bg_valid = data[f"bgv_{i}"]
        return d

    def batch_for(i):
        return dict(batch, recon_face_dets=detections_to_batch(
            dets_for(i), s_steps, BATCH, rcfg.max_bg_faces))

    t0 = time.perf_counter()
    state, metrics = step(state, batch_for(0), jax.random.PRNGKey(0))
    loss = float(np.asarray(metrics["loss"]))
    print(f"# train compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.4f} arcface="
          f"{float(np.asarray(metrics.get('loss_arcface_align_recon', 0))):.4f}",
          file=sys.stderr)
    assert np.isfinite(loss)

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        state, metrics = step(state, batch_for(i), jax.random.PRNGKey(i))
        _sync(metrics["loss"])
        times.append(time.perf_counter() - t0)
    t_train = float(np.median(times))
    t_collect = float(data["collect_time"])
    t_detect = float(data["detect_time"])
    total = t_train + t_collect + t_detect
    sps = 1.0 / total
    result = {
        "metric": "recon_train_step_throughput",
        "value": round(sps, 4),
        "unit": f"steps/sec/chip@bs{BATCH} (2-step denoise + identity loss,"
                " two-phase)",
        "train_sec": round(t_train, 3),
        "collect_sec": round(t_collect, 3),
        "detect_sec": round(t_detect, 4),
        "vs_ref_per_gpu": round(sps / REF_STEPS_PER_SEC_PER_GPU, 2),
    }
    print(json.dumps(result))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "BENCH_train.json")
    try:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    except OSError as e:
        print(f"# could not write {out_path}: {e}", file=sys.stderr)


def phase_legacy():
    import jax
    import numpy as np

    from adaface_tpu.train.train_step import make_train_step, recon_loss_fn

    frozen, trainable, batch, sched, cfg, opt, state = _build(full=False)
    step = make_train_step(recon_loss_fn, opt, frozen, sched, cfg,
                           donate=False)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    loss = float(np.asarray(metrics["loss"]))
    print(f"# compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.4f}", file=sys.stderr)
    assert np.isfinite(loss)
    times = []
    for i in range(1, ITERS + 1):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        _sync(metrics["loss"])
        times.append(time.perf_counter() - t0)
    sps = 1.0 / float(np.median(times))
    print(json.dumps({
        "metric": "recon_train_step_throughput_legacy_single_step",
        "value": round(sps, 4),
        "unit": f"steps/sec/chip@bs{BATCH}",
        "vs_ref_per_gpu": round(sps / REF_STEPS_PER_SEC_PER_GPU, 2),
    }))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "collect":
        phase_collect()
    elif mode == "train":
        phase_train()
    elif mode == "legacy":
        phase_legacy()
    else:
        # chain the two phases through subprocesses: one big relay
        # compile per process (measured constraint)
        here = os.path.abspath(__file__)
        for phase in ("collect", "train"):
            r = subprocess.run([sys.executable, here, phase])
            if r.returncode != 0:
                sys.exit(r.returncode)


if __name__ == "__main__":
    main()
