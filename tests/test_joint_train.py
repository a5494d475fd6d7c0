"""Joint-encoder (multi-SubjBasisGenerator) training path: ada segments
from per-encoder SBGs concatenate along the token axis and gradients flow
into both (`Joint_FaceID2AdaPrompt`, reference
`face_id_to_ada_prompt.py:868-1302`)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.id2ada.subj_basis_generator import (
    SubjBasisConfig, init_subj_basis_generator)
from adaface_tpu.models.clip import init_text_params
from adaface_tpu.models.unet import init_unet_params
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.text.embedding_manager import EmbeddingManager, PlaceholderSpec
from adaface_tpu.text.tokenizer import CLIPTokenizer
from adaface_tpu.train.prompt_batch import build_4block_prompt_batch
from adaface_tpu.train.train_step import (
    TrainConfig, compute_ada_embs, recon_loss_fn)

from tests.test_train import CLIP_CFG, UNET_CFG, HW, D

K0, K1 = 4, 2  # joint: 4 + 2 ada tokens (stands in for 16 + 4)


def _joint_setup(b=2):
    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    em = EmbeddingManager(tok, [PlaceholderSpec("z", K0 + K1)])
    cfg0 = SubjBasisConfig(num_id_vecs=K0, output_dim=D, clip=CLIP_CFG)
    cfg1 = SubjBasisConfig(num_id_vecs=K1, output_dim=D, clip=CLIP_CFG)
    sbg0 = init_subj_basis_generator(jax.random.fold_in(rng, 1), cfg0,
                                     tokenizer=tok)
    sbg1 = init_subj_basis_generator(jax.random.fold_in(rng, 2), cfg1,
                                     tokenizer=tok)
    frozen = {
        "unet": init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG),
        "text_encoder": init_text_params(jax.random.fold_in(rng, 4), CLIP_CFG),
        "sbg_buffers": [sbg0["buffers"], sbg1["buffers"]],
    }
    trainable = {"sbg": [sbg0["params"], sbg1["params"]]}

    ph = em.expand_placeholder(em.placeholders[0])
    pbatch = build_4block_prompt_batch(
        em, [f"a photo of {ph}"] * b, [f"a photo of {ph} on a bike"] * b,
        ["a photo of person"] * b, ["a photo of person on a bike"] * b)
    key = jax.random.PRNGKey(42)
    batch = {
        "x_start": jax.random.normal(jax.random.fold_in(key, 0), (b, 4, HW, HW)),
        "noise": jax.random.normal(jax.random.fold_in(key, 1), (b, 4, HW, HW)),
        "t": jnp.full((b,), 500, jnp.int32),
        "img_prompt_embs": jax.random.normal(
            jax.random.fold_in(key, 2), (b, K0 + K1, D)),
        "prompt_ids": jnp.asarray(pbatch["prompt_ids"]),
        "splice_map": jnp.asarray(pbatch["splice_map"]),
        "prompt_emb_mask": jnp.asarray(pbatch["prompt_emb_mask"]),
        "img_mask": jnp.ones((b, 1, HW, HW)),
        "fg_mask": jnp.ones((b, 1, HW, HW)),
        "face_detected": jnp.ones((b,)),
    }
    cfg = TrainConfig(unet=UNET_CFG, sbg=(cfg0, cfg1), clip_text=CLIP_CFG)
    return frozen, trainable, batch, cfg


def test_compute_ada_embs_segments():
    frozen, trainable, batch, cfg = _joint_setup()
    ada = compute_ada_embs(trainable, frozen, batch["img_prompt_embs"], cfg)
    assert ada.shape == (2, K0 + K1, D)
    # the first segment depends only on the first SBG: perturbing the
    # second SBG's params must not change tokens [:K0]
    z = {"sbg": [trainable["sbg"][0],
                 jax.tree_util.tree_map(lambda x: x * 1.5,
                                        trainable["sbg"][1])]}
    ada_z = compute_ada_embs(z, frozen, batch["img_prompt_embs"], cfg)
    np.testing.assert_allclose(np.asarray(ada[:, :K0]),
                               np.asarray(ada_z[:, :K0]), atol=1e-6)
    assert np.abs(np.asarray(ada[:, K0:]) - np.asarray(ada_z[:, K0:])).max() > 1e-6


def test_joint_recon_loss_grads_reach_both_sbgs():
    frozen, trainable, batch, cfg = _joint_setup()
    sched = DiffusionSchedule.create()
    (loss, metrics), grads = jax.value_and_grad(recon_loss_fn, has_aux=True)(
        trainable, frozen, batch, sched, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for i in (0, 1):
        g = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(grads["sbg"][i]))
        assert g > 0, f"no grads reached sbg[{i}]"
