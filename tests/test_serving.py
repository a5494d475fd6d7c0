"""Continuous-batching serving (`adaface_tpu/inference/serving.py`).

Correctness bar: a request served through the slot pool must produce
EXACTLY the trajectory the one-shot pipeline produces (same DDIM math,
same CFG interpolation), regardless of which other requests share the
batch or when the slot was admitted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.id2ada.face_backends import DeterministicBackend
from adaface_tpu.id2ada.face_id_to_ada_prompt import Arc2FaceID2AdaPrompt
from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules
from adaface_tpu.inference.serving import ContinuousBatcher, Request
from adaface_tpu.inference.wrapper import AdaFaceWrapper
from adaface_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig, text_encode
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
STEPS = 3
HW = 128


@pytest.fixture(scope="module")
def modules():
    return PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT)


def pipeline_reference(modules, prompt, seed, guidance_scale=6.0,
                       guidance_scale_min=None):
    """One-shot pipeline output with the batcher's per-seed latent draw."""
    pipe = DiffusionPipeline(modules, dtype=jnp.float32)
    s = modules.vae_cfg.spatial_scale
    lat = jax.random.normal(jax.random.PRNGKey(seed),
                            (4, HW // s, HW // s), jnp.float32)
    return np.asarray(pipe(
        [prompt], negative_prompt="", num_inference_steps=STEPS,
        guidance_scale=guidance_scale, guidance_scale_min=guidance_scale_min,
        height=HW, width=HW, latents=lat[None]))[0]


def test_single_request_matches_pipeline(modules):
    b = ContinuousBatcher(modules, num_slots=2, num_inference_steps=STEPS,
                          height=HW, width=HW, dtype=jnp.float32)
    out = b.generate_all([Request("a photo of a cat", seed=7)])
    ref = pipeline_reference(modules, "a photo of a cat", seed=7)
    assert len(out) == 1
    np.testing.assert_allclose(out[0], ref, atol=1e-4)


def test_mixed_batch_slots_are_isolated(modules):
    """5 requests through 2 slots (forces refills mid-flight); every output
    must equal its solo pipeline run — different prompts, seeds, and
    guidance scales sharing a batch must not bleed into each other."""
    reqs = [Request(f"prompt number {i}", seed=10 + i,
                    guidance_scale=2.0 + i,
                    guidance_scale_min=1.0 if i % 2 else None)
            for i in range(5)]
    b = ContinuousBatcher(modules, num_slots=2, num_inference_steps=STEPS,
                          height=HW, width=HW, dtype=jnp.float32)
    out = b.generate_all(reqs)
    assert sorted(out) == [0, 1, 2, 3, 4]
    for i in (0, 3, 4):
        ref = pipeline_reference(
            modules, f"prompt number {i}", seed=10 + i,
            guidance_scale=2.0 + i,
            guidance_scale_min=1.0 if i % 2 else None)
        np.testing.assert_allclose(out[i], ref, atol=1e-4, err_msg=f"req {i}")


@pytest.fixture(scope="module")
def wrapper(modules):
    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(1), face_backend=DeterministicBackend(),
        clip_vision_cfg=TINY_VISION, sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT, output_dim=D)
    return AdaFaceWrapper("text2img", modules, enc,
                          num_inference_steps=STEPS, dtype=jnp.float32)


def test_ada_injection_matches_table_write(wrapper, modules):
    """Per-sample injection (serving path) must produce the same prompt
    embeddings as the reference's embedding-table write
    (`adaface_wrapper.py:461-489`)."""
    imgs = [np.random.RandomState(0).randint(0, 255, (128, 128, 3), np.uint8)]
    ada = wrapper.prepare_adaface_embeddings(images=imgs)  # writes the table
    prompt = wrapper.update_prompt("portrait of")
    ids = jnp.asarray(modules.tokenizer([prompt], max_length=77))
    table_cond = text_encode(modules.text_encoder, ids,
                             TINY_TEXT)["last_hidden_state"]

    b = wrapper.make_batcher(num_slots=1)
    req = wrapper.make_request("portrait of", ada_embs=ada)
    b._admit(0, req)
    inj_cond = b._state.cond[0]
    np.testing.assert_allclose(np.asarray(inj_cond),
                               np.asarray(table_cond[0]), atol=1e-5)


def test_multi_subject_requests(wrapper):
    """Two different subjects in flight at once — the serving headline.
    Outputs must differ (different identities) and be finite/valid."""
    ada_a = wrapper.prepare_adaface_embeddings(
        images=[np.random.RandomState(1).randint(0, 255, (128, 128, 3),
                                                 np.uint8)],
        update_text_encoder=False)
    ada_b = wrapper.prepare_adaface_embeddings(
        images=[np.random.RandomState(2).randint(0, 255, (128, 128, 3),
                                                 np.uint8)],
        update_text_encoder=False)
    b = wrapper.make_batcher(num_slots=2, height=HW, width=HW)
    out = b.generate_all([
        wrapper.make_request("portrait", ada_embs=ada_a, seed=5),
        wrapper.make_request("portrait", ada_embs=ada_b, seed=5),
    ])
    assert len(out) == 2
    for img in out.values():
        assert img.shape == (3, HW, HW)
        assert np.isfinite(img).all()
        assert 0.0 <= img.min() and img.max() <= 1.0
    # same prompt + same seed, different subject → different images
    assert np.abs(out[0] - out[1]).max() > 1e-4
