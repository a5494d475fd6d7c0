import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.id2ada.face_backends import DeterministicBackend
from adaface_tpu.id2ada.face_id_to_ada_prompt import Arc2FaceID2AdaPrompt
from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules
from adaface_tpu.inference.wrapper import AdaFaceWrapper
from adaface_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.models.vae import VAEConfig

D = 64
TINY_TEXT = CLIPTextConfig(hidden_size=D, num_layers=2, num_heads=2,
                           intermediate_size=128)
TINY_UNET = UNetConfig(block_channels=(16, 32, 32, 32), cross_attn_dim=D,
                       num_heads=2, norm_groups=8, lora_rank=4, lora_alpha=1)
TINY_VAE = VAEConfig(base_ch=16, ch_mult=(1, 2, 2), num_res_blocks=1,
                     norm_groups=8)
TINY_VISION = CLIPVisionConfig(hidden_size=D, num_layers=2, num_heads=2,
                               intermediate_size=128, image_size=224,
                               patch_size=32)


@pytest.fixture(scope="module")
def modules():
    return PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT)


def test_pipeline_text2img(modules):
    pipe = DiffusionPipeline(modules, dtype=jnp.float32)
    img = pipe("a photo of a cat", num_inference_steps=3,
               guidance_scale=4.0, height=128, width=128)
    assert img.shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(img)).all()
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0


def test_pipeline_dual_scale_and_batch(modules):
    pipe = DiffusionPipeline(modules, dtype=jnp.float32)
    img = pipe(["a", "b"], num_inference_steps=2, guidance_scale=4.0,
               guidance_scale_min=1.0, height=128, width=128)
    assert img.shape == (2, 3, 128, 128)


@pytest.fixture(scope="module")
def wrapper(modules):
    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=TINY_VISION,
        sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT,
        output_dim=D,
    )
    return AdaFaceWrapper("text2img", modules, enc,
                          num_inference_steps=2, dtype=jnp.float32)


def test_wrapper_placeholder_extension(wrapper, modules):
    tok = modules.tokenizer
    assert wrapper.placeholder_tokens[0][0] == "z_0_0"
    assert len(wrapper.placeholder_tokens[0]) == 16
    # embedding table extended to cover the new ids
    assert modules.text_encoder["token_embedding"].shape[0] == tok.vocab_size


def test_wrapper_end_to_end(wrapper):
    imgs = [np.random.RandomState(i).randint(0, 255, (128, 128, 3), np.uint8)
            for i in range(2)]
    ada = wrapper.prepare_adaface_embeddings(images=imgs)
    assert ada is not None and ada.shape == (16, D)
    # ada embeddings must be written into the table rows
    table = wrapper.pipeline.m.text_encoder["token_embedding"]
    row0 = table[wrapper.placeholder_token_ids[0][0]]
    np.testing.assert_allclose(np.asarray(row0), np.asarray(ada[0]), atol=1e-5)

    out = wrapper.forward("portrait at the beach", num_images=2,
                          num_inference_steps=2, rng=jax.random.PRNGKey(0),
                          height=128, width=128)
    assert out.shape == (2, 3, 128, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_wrapper_update_prompt(wrapper):
    p = wrapper.update_prompt("a portrait")
    assert "z_0_0" in p and p.startswith("a portrait")
    # idempotent
    assert wrapper.update_prompt(p) == p


def test_wrapper_img2img(modules):
    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(2),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=TINY_VISION,
        sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT,
        output_dim=D,
    )
    w = AdaFaceWrapper("img2img", modules, enc, dtype=jnp.float32)
    src = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    out = w.forward("a portrait", init_image=src, num_images=1,
                    num_inference_steps=4, strength=0.5)
    assert out.shape == (1, 3, 64, 64)


def test_wrapper_rejects_unimplemented_pipelines(modules):
    # sdxl and sd3 graduated to real implementations (tests/test_sdxl.py,
    # tests/test_sd3.py); flux keeps the API surface but stays
    # unimplemented (commented out in the reference too)
    with pytest.raises(NotImplementedError):
        AdaFaceWrapper("flux", modules, None)


def test_pipeline_unet_ensemble(modules):
    import dataclasses

    from adaface_tpu.models.unet import init_unet_params

    unet2 = init_unet_params(jax.random.PRNGKey(7), TINY_UNET)
    m2 = dataclasses.replace(modules) if dataclasses.is_dataclass(modules) else modules
    import copy

    m2 = copy.copy(modules)
    m2.unet = [modules.unet, unet2]
    m2.unet_weights = (0.6, 0.4)
    pipe = DiffusionPipeline(m2, dtype=jnp.float32)
    img = pipe("a cat", num_inference_steps=2, guidance_scale=3.0,
               height=128, width=128)
    assert img.shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(img)).all()


def test_wrapper_long_prompts(modules):
    import copy

    from adaface_tpu.id2ada.face_backends import DeterministicBackend
    from adaface_tpu.id2ada.face_id_to_ada_prompt import Arc2FaceID2AdaPrompt

    m2 = copy.copy(modules)
    m2.text_encoder = dict(modules.text_encoder)
    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(5), face_backend=DeterministicBackend(),
        clip_vision_cfg=TINY_VISION, sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT, output_dim=D)
    w = AdaFaceWrapper("text2img", m2, enc, dtype=jnp.float32,
                       max_prompt_length=147, num_inference_steps=2)
    assert m2.text_encoder["position_embedding"].shape[0] == 147
    long_prompt = "a portrait of a person " * 20  # > 77 tokens
    out = w.forward(long_prompt, num_images=1, num_inference_steps=2,
                    height=128, width=128)
    assert out.shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_attn_lora_changes_output(modules, tmp_path):
    """Loaded UNet LoRAs must flow into generation
    (`load_unet_lora_weights`, `adaface_wrapper.py:374-413`)."""
    from adaface_tpu.models.unet import init_attn_lora_params

    pipe = DiffusionPipeline(modules, dtype=jnp.float32)
    kw = dict(num_inference_steps=2, guidance_scale=1.0,
              height=64, width=64, return_latents=True)
    base = pipe("a cat", **kw)

    lora = init_attn_lora_params(jax.random.PRNGKey(3), TINY_UNET)
    # B starts at 0 → identical output until we give B weight
    lora = jax.tree_util.tree_map(
        lambda x: x if x.ndim != 2 else x + 0.3, lora)
    modules.attn_lora = lora
    try:
        with_lora = pipe("a cat", **kw)
    finally:
        modules.attn_lora = None
    assert not np.allclose(np.asarray(base), np.asarray(with_lora), atol=1e-5)

    # wrapper loads LoRA from an adaface ckpt directory
    from adaface_tpu.train.checkpoint import save_adaface_ckpt

    save_adaface_ckpt(str(tmp_path / "ck"), 1, {"joint": {}},
                      unet_lora_params={"attn_lora": lora})
    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(1), face_backend=DeterministicBackend(),
        clip_vision_cfg=TINY_VISION, sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT, output_dim=D)
    w = AdaFaceWrapper("text2img", modules, enc, dtype=jnp.float32)
    w.load_unet_lora_weights(str(tmp_path / "ck"))
    assert w.pipeline.m.attn_lora is not None
    modules.attn_lora = None  # leave the shared fixture clean


def test_wrapper_text2video(modules):
    """The AdaFace-Animate route: text2video with zero-init motion modules
    reproduces per-frame image behavior and returns [N, F, 3, H, W]."""
    from adaface_tpu.models.motion import MotionConfig

    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(1), face_backend=DeterministicBackend(),
        clip_vision_cfg=TINY_VISION, sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT, output_dim=D)
    w = AdaFaceWrapper(
        "text2video", modules, enc, num_inference_steps=2,
        dtype=jnp.float32,
        motion_cfg=MotionConfig(num_heads=2, norm_groups=8))
    imgs = np.random.default_rng(0).uniform(
        0, 255, (1, 64, 64, 3)).astype(np.uint8)
    w.prepare_adaface_embeddings([imgs[0]])
    vid = w("person dancing", num_frames=2, num_images=1,
            height=64, width=64)
    assert vid.shape == (1, 2, 3, 64, 64)
    assert np.isfinite(np.asarray(vid)).all()
