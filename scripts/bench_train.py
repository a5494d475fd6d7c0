"""Training-step throughput benchmark at real SD1.5 sizes.

The reference's only published performance number is training cost:
stage-1 = 120k steps in 1-2 days on 2x RTX A6000 at bs4/GPU
(`/root/reference/README.md:72` via BASELINE.md) — i.e. ~0.7-1.4
optimizer steps/sec for the 2-GPU machine, ~0.35-0.7 steps/sec/GPU.

This measures our recon train step (ada-embedding generation through the
trainable SubjBasisGenerator -> CLIP splice -> SD1.5 UNet fwd+bwd ->
CAdamW update) at bs4 on one chip, end to end, so the train-side claim in
BASELINE.md is a measured number rather than an extrapolation.

Usage: python scripts/bench_train.py [batch] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# reference: 120k steps / 1.5 days avg on 2 GPUs -> per-GPU steps/sec at bs4
REF_STEPS_PER_SEC_PER_GPU = 120_000 / (1.5 * 86400) / 2


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

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
    from adaface_tpu.train.train_step import (TrainConfig, init_state,
                                              make_train_step, recon_loss_fn)

    k_id = 16
    sbg_cfg = SubjBasisConfig(num_id_vecs=k_id)
    rng = jax.random.PRNGKey(0)
    tok = default_tokenizer()

    # init on host CPU (device-side init dispatches hundreds of tiny ops
    # through the relay), ship once; frozen towers in bf16, trainable fp32
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sbg = init_subj_basis_generator(jax.random.fold_in(rng, 1), sbg_cfg,
                                        tokenizer=tok)
        frozen_host = {
            "unet": init_unet_params(jax.random.fold_in(rng, 2), SD15_UNET),
            "text_encoder": init_text_params(jax.random.fold_in(rng, 3),
                                             CLIP_L_TEXT),
            "sbg_buffers": sbg["buffers"],
        }
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    dev = jax.devices()[0]
    frozen = {
        "unet": jax.device_put(bf16(frozen_host["unet"]), dev),
        "text_encoder": jax.device_put(bf16(frozen_host["text_encoder"]), dev),
        # NOT device_put: sbg_buffers carries static python ints (id_start)
        # that make_train_step closes over as compile-time constants
        "sbg_buffers": frozen_host["sbg_buffers"],
    }
    trainable = jax.device_put({"sbg": sbg["params"]}, dev)

    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    ph = em.expand_placeholder(em.placeholders[0])
    pb = build_4block_prompt_batch(
        em,
        [f"a photo of {ph}"] * batch,
        [f"a photo of {ph} riding a bike"] * batch,
        ["a photo of person"] * batch,
        ["a photo of person riding a bike"] * batch,
    )
    key = jax.random.PRNGKey(7)
    hw = 64
    batch_dev = jax.device_put({
        "x_start": jax.random.normal(jax.random.fold_in(key, 0),
                                     (batch, 4, hw, hw)),
        "noise": jax.random.normal(jax.random.fold_in(key, 1),
                                   (batch, 4, hw, hw)),
        "t": jnp.full((batch,), 500, jnp.int32),
        "img_prompt_embs": jax.random.normal(jax.random.fold_in(key, 2),
                                             (batch, k_id, 768)),
        "prompt_ids": jnp.asarray(pb["prompt_ids"]),
        "splice_map": jnp.asarray(pb["splice_map"]),
        "prompt_emb_mask": jnp.asarray(pb["prompt_emb_mask"]),
        "img_mask": jnp.ones((batch, 1, hw, hw)),
        "fg_mask": jnp.ones((batch, 1, hw, hw)),
        "face_detected": jnp.ones((batch,)),
    }, dev)

    sched = DiffusionSchedule.create()
    cfg = TrainConfig(unet=SD15_UNET, sbg=sbg_cfg, clip_text=CLIP_L_TEXT)
    opt = make_optimizer("cadamw", 1e-3)
    state = init_state(trainable, opt)
    step = make_train_step(recon_loss_fn, opt, frozen, sched, cfg,
                           donate=False)

    t0 = time.perf_counter()
    state, metrics = step(state, batch_dev, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    print(f"# compile+first step: {time.perf_counter()-t0:.1f}s loss={loss:.4f}")
    assert np.isfinite(loss)

    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        state, metrics = step(state, batch_dev, jax.random.PRNGKey(i))
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    sps = 1.0 / dt
    print(json.dumps({
        "metric": "recon_train_step_throughput",
        "value": round(sps, 4),
        "unit": f"steps/sec/chip@bs{batch}",
        "vs_ref_per_gpu": round(sps / REF_STEPS_PER_SEC_PER_GPU, 2),
    }))


if __name__ == "__main__":
    main()
