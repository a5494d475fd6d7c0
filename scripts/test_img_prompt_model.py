"""Teacher sanity-check CLI (`adaface/test_img_prompt_model.py` equivalent).

Runs the raw teacher pipeline — face-ID → image-prompt embeddings →
teacher UNet denoising — WITHOUT the ada mapping, to verify the teacher
stack end-to-end:

    python scripts/test_img_prompt_model.py --subject subj/ [--randface] \
        --out_dir out_teacher/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _common import add_model_args, load_subject_images, save_images


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--subject", default=None)
    ap.add_argument("--randface", action="store_true")
    ap.add_argument("--num_images", type=int, default=2)
    ap.add_argument("--num_steps", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", default="out_teacher")
    args = ap.parse_args()
    assert args.subject or args.randface

    from adaface_tpu.id2ada.face_id_to_ada_prompt import create_id2ada_prompt_encoder
    from adaface_tpu.id2ada.teachers import create_unet_teacher
    from adaface_tpu.models.unet import SD15_UNET, init_unet_params
    from adaface_tpu.models.vae import SD_VAE, init_vae_params, vae_decode
    from adaface_tpu.ops.schedules import DiffusionSchedule

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        unet = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            init_unet_params(jax.random.PRNGKey(0), SD15_UNET))
        vae = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            init_vae_params(jax.random.PRNGKey(1), SD_VAE))
        encoder = create_id2ada_prompt_encoder(args.encoder,
                                               jax.random.PRNGKey(2))
    dev = jax.devices()[0]
    unet = jax.device_put(unet, dev)
    vae = jax.device_put(vae, dev)

    rng = jax.random.PRNGKey(args.seed)
    if args.randface:
        _, _, img_prompt_embs, _ = encoder.get_img_prompt_embs(
            id_batch_size=args.num_images, rng=rng)
    else:
        images = load_subject_images(args.subject)
        _, _, img_prompt_embs, _ = encoder.get_img_prompt_embs(
            images=images, id_batch_size=args.num_images,
            avg_at_stage="id_emb", rng=rng)
    if img_prompt_embs is None:
        raise SystemExit("no identity could be prepared")
    print(f"img prompt embs: {img_prompt_embs.shape}")

    teacher = create_unet_teacher("simple_unet", unet_params=unet,
                                  unet_cfg=SD15_UNET)
    sched = DiffusionSchedule.create()
    s = args.size // 8
    k1, k2, k3 = jax.random.split(rng, 3)
    x_start = jax.random.normal(k1, (args.num_images, 4, s, s), jnp.bfloat16)
    noise = jax.random.normal(k2, x_start.shape, jnp.bfloat16)
    t = jnp.full((args.num_images,), 999, jnp.int32)
    ctx = jnp.asarray(img_prompt_embs, jnp.bfloat16)
    _, x_starts, _, _ = teacher(
        sched, x_start, noise, t, ctx,
        num_denoising_steps=args.num_steps, rng=k3)
    img = vae_decode(vae, x_starts[-1].astype(jnp.bfloat16), SD_VAE)
    img = jnp.clip((img.astype(jnp.float32) + 1) / 2, 0, 1)
    paths = save_images(img, args.out_dir, prefix="teacher")
    print(f"wrote {len(paths)} teacher samples to {args.out_dir}")


if __name__ == "__main__":
    main()
