import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.id2ada.face_backends import DeterministicBackend
from adaface_tpu.id2ada.face_id_to_ada_prompt import (
    Arc2FaceID2AdaPrompt,
    ConsistentIDID2AdaPrompt,
    JointFaceID2AdaPrompt,
    create_id2ada_prompt_encoder,
)
from adaface_tpu.id2ada.subj_basis_generator import (
    SubjBasisConfig,
    extend_prompt2token_proj_attention,
    init_subj_basis_generator,
    inverse_img_prompt_embs,
    subj_basis_forward,
)
from adaface_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig

D = 64
SMALL_CLIP = CLIPTextConfig(hidden_size=D, num_layers=2, num_heads=2,
                            intermediate_size=128)
SMALL_VISION = CLIPVisionConfig(hidden_size=D, num_layers=2, num_heads=2,
                                intermediate_size=128, image_size=224,
                                patch_size=32)
SBG_CFG = SubjBasisConfig(num_id_vecs=4, num_static_img_suffix_embs=2,
                          output_dim=D, clip=SMALL_CLIP)


@pytest.fixture(scope="module")
def sbg():
    return init_subj_basis_generator(jax.random.PRNGKey(0), SBG_CFG)


def test_sbg_forward_shape_and_grad(sbg):
    face = jax.random.normal(jax.random.PRNGKey(1), (2, 4, D))
    out = subj_basis_forward(sbg, face, SBG_CFG)
    assert out.shape == (2, 4, D)

    def loss(params):
        s = {"params": params, "buffers": sbg["buffers"]}
        return (subj_basis_forward(s, face, SBG_CFG) ** 2).sum()

    g = jax.grad(loss)(sbg["params"])
    hw_grad = np.abs(np.asarray(g["hidden_state_layer_weights"])).sum()
    assert hw_grad > 0
    proj_grad = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["prompt2token_proj"]))
    assert proj_grad > 0


def test_sbg_static_suffix(sbg):
    face = jax.random.normal(jax.random.PRNGKey(1), (1, 4, D))
    out = subj_basis_forward(sbg, face, SBG_CFG, enable_static_img_suffix_embs=True)
    assert out.shape == (1, 6, D)  # 4 id + 2 suffix


def test_sbg_cfg_scale_zero_gives_pad_embs(sbg):
    face = jax.random.normal(jax.random.PRNGKey(1), (1, 4, D))
    out = subj_basis_forward(sbg, face, SBG_CFG, out_id_embs_cfg_scale=0.0)
    start = sbg["buffers"]["id_start"]
    pad = sbg["buffers"]["pad_embeddings"][start:start + 4]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pad), atol=1e-5)


def test_sbg_layerwise_proj():
    """use_layerwise_proj → per-layer ada embeddings [B,L,N,D] with an
    identity-ish skip (`LayerwiseMLPProjWithSkip`,
    `subj_basis_generator.py:61-77,759`)."""
    cfg = SubjBasisConfig(num_id_vecs=4, output_dim=D, clip=SMALL_CLIP,
                          use_layerwise_proj=True, layerwise_num_layers=3,
                          layerwise_dim_mult=2)
    sbg = init_subj_basis_generator(jax.random.PRNGKey(0), cfg)
    face = jax.random.normal(jax.random.PRNGKey(1), (2, 4, D))
    out = subj_basis_forward(sbg, face, cfg)
    assert out.shape == (2, 3, 4, D)
    assert np.isfinite(np.asarray(out)).all()
    # the projection is trainable
    g = jax.grad(lambda p: (subj_basis_forward(
        {"params": p, "buffers": sbg["buffers"]}, face, cfg) ** 2).sum()
    )(sbg["params"])
    assert float(jnp.abs(g["layerwise_proj"]["w1"]).sum()) > 0
    # CFG token-mixing happens before the projection: scale 0 must equal
    # projecting the pad embeddings directly
    from adaface_tpu.id2ada.subj_basis_generator import _apply_layerwise_proj

    out0 = subj_basis_forward(sbg, face, cfg, out_id_embs_cfg_scale=0.0)
    start = int(sbg["buffers"]["id_start"])
    pad = sbg["buffers"]["pad_embeddings"][start:start + 4][None]
    ref = _apply_layerwise_proj(sbg["params"]["layerwise_proj"],
                                jnp.broadcast_to(pad, (2, 4, D)), 3, 2)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref), atol=2e-5)


def test_inverse_emb_types(sbg):
    face = jax.random.normal(jax.random.PRNGKey(2), (1, 4, D))
    core, full, full_pad, half_pad = inverse_img_prompt_embs(
        sbg, SBG_CFG, face, ("core", "full", "full_pad", "full_half_pad"))
    assert core.shape == (1, 4, D)
    assert full.shape == (1, 77, D)
    start = sbg["buffers"]["id_start"]
    pad_begin = start + 4 + 2 + 2
    pad = sbg["buffers"]["pad_embeddings"]
    np.testing.assert_allclose(np.asarray(full_pad[0, pad_begin:-1]),
                               np.asarray(pad[pad_begin:-1]), atol=1e-5)
    # half_pad: first half of the tail padded, second half kept from full
    np.testing.assert_allclose(np.asarray(half_pad[0, -2]),
                               np.asarray(full[0, -2]), atol=1e-6)


def test_sbg_mkv_extension_identity(sbg):
    face = jax.random.normal(jax.random.PRNGKey(3), (1, 4, D))
    base = subj_basis_forward(sbg, face, SBG_CFG)
    ext = extend_prompt2token_proj_attention(
        sbg, jax.random.PRNGKey(4), [2] * SMALL_CLIP.num_layers, perturb_std=0.0,
        cfg=SBG_CFG)
    out = subj_basis_forward(ext, face, SBG_CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_bg_path():
    cfg = SubjBasisConfig(placeholder_is_bg=True, output_dim=D,
                          bg_image_embedding_dim=96, num_out_embs_bg=8,
                          num_bg_encoder_heads=4)
    sbg = init_subj_basis_generator(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 257, 96))
    out = subj_basis_forward(sbg, None, cfg, clip_features=feats)
    assert out.shape == (2, 8, D)


def _small_kw():
    return dict(
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION,
        sbg_clip_cfg=SMALL_CLIP,
        output_dim=D,
    )


@pytest.fixture(scope="module")
def arc2face():
    return Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(0), text_cfg=SMALL_CLIP, **_small_kw())


def test_arc2face_map(arc2face):
    ids = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    out = arc2face.map_init_id_to_img_prompt_embs(ids)
    assert out.shape == (2, 16, D)
    # non-uniform perturbation (a constant shift is erased by LayerNorm)
    delta = jnp.sin(jnp.arange(512))[None]
    out2 = arc2face.map_init_id_to_img_prompt_embs(ids + delta)
    assert np.abs(np.asarray(out2 - out)).max() > 1e-4


def test_arc2face_generate_from_images(arc2face):
    imgs = [np.random.RandomState(i).randint(0, 255, (64, 64, 3), np.uint8)
            for i in range(3)]
    ada, imgp, lens = arc2face.generate_adaface_embeddings(
        images=imgs, avg_at_stage="id_emb")
    assert ada.shape == (16, D)
    assert lens == [16]
    # deterministic backend → reproducible
    ada2, _, _ = arc2face.generate_adaface_embeddings(
        images=imgs, avg_at_stage="id_emb")
    np.testing.assert_allclose(np.asarray(ada), np.asarray(ada2), atol=1e-6)


def test_arc2face_random_id_path(arc2face):
    ada, imgp, _ = arc2face.generate_adaface_embeddings(
        images=None, face_id_embs=None, avg_at_stage=None,
        rng=jax.random.PRNGKey(5))
    assert ada.shape == (1, 16, D)


def test_consistentid_map_and_neg():
    enc = ConsistentIDID2AdaPrompt(jax.random.PRNGKey(0), **_small_kw())
    assert enc.out_id_embs_cfg_scale == 6.0
    assert enc.clip_embedding_dim == D  # follows the vision tower
    ids = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    n_tok = (224 // 32) ** 2 + 1
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 2 * n_tok, D))
    out = enc.map_init_id_to_img_prompt_embs(ids, feats)
    assert out.shape == (2, 4, D)
    count, faceid, pos, neg = enc.get_img_prompt_embs(
        init_id_embs=ids, pre_clip_features=feats, id_batch_size=2)
    assert pos.shape == (2, 4, D) and neg is not None and neg.shape == (2, 4, D)


def test_joint_encoder():
    joint = create_id2ada_prompt_encoder(
        "jointIDs", jax.random.PRNGKey(0), **_small_kw())
    assert isinstance(joint, JointFaceID2AdaPrompt)
    assert joint.num_id_vecs == 20
    imgs = [np.random.RandomState(i).randint(0, 255, (64, 64, 3), np.uint8)
            for i in range(2)]
    ada, _, lens = joint.generate_adaface_embeddings(
        images=imgs, avg_at_stage="id_emb")
    assert ada.shape == (20, D)
    assert lens == [16, 4]


def test_joint_dropout_never_drops_all():
    joint = create_id2ada_prompt_encoder(
        "jointIDs", jax.random.PRNGKey(0), is_training=True, **_small_kw())
    imgs = [np.random.RandomState(7).randint(0, 255, (64, 64, 3), np.uint8)]
    for i in range(5):
        ada, _, _ = joint.generate_adaface_embeddings(
            images=imgs, avg_at_stage="id_emb", p_dropout=0.99,
            rng=jax.random.PRNGKey(i))
        assert ada is not None and ada.shape == (20, D)
        # with p≈1, one encoder is dropped (zeros) but never both
        zero_rows = np.asarray((jnp.abs(ada).sum(-1) == 0))
        assert zero_rows.sum() in (0, 4, 16)
