"""SD3 family: MMDiT (models/mmdit.py), rectified-flow sampling, the
converter round trip, and the text2img3 pipeline/wrapper branch
(`adaface/adaface_wrapper.py:128,601-607`)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.models.clip import CLIP_L_TEXT, CLIPTextConfig
from adaface_tpu.models.mmdit import (MMDiTConfig, init_mmdit_params,
                                      mmdit_apply)
from adaface_tpu.models.vae import VAEConfig

TINY_MMDIT = MMDiTConfig(depth=3, hidden=64, num_heads=4, context_dim=96,
                         pooled_dim=48, pos_embed_max_size=16,
                         time_embed_dim=32, in_channels=16, out_channels=16)
TINY_VAE16 = VAEConfig(base_ch=16, ch_mult=(1, 2, 2), num_res_blocks=1,
                       norm_groups=8, z_channels=16)
D1, D2 = 32, 40
TINY_TEXT = CLIPTextConfig(hidden_size=D1, num_layers=3, num_heads=2,
                           intermediate_size=64, projection_dim=24)
TINY_TEXT2 = CLIPTextConfig(hidden_size=D2, num_layers=3, num_heads=2,
                            intermediate_size=64, hidden_act="gelu",
                            projection_dim=24)


def _inputs(b=2, hw=8, s=12):
    k = jax.random.PRNGKey(0)
    return (
        jax.random.normal(jax.random.fold_in(k, 0), (b, 16, hw, hw)),
        jnp.asarray([500.0] * b),
        jax.random.normal(jax.random.fold_in(k, 1),
                          (b, s, TINY_MMDIT.context_dim)),
        jax.random.normal(jax.random.fold_in(k, 2),
                          (b, TINY_MMDIT.pooled_dim)),
    )


def test_mmdit_adaln_zero_init_outputs_zero():
    """AdaLN-zero gates and the zero-initialized head make a fresh model
    the exact zero function — wiring check for the modulation path."""
    p = init_mmdit_params(jax.random.PRNGKey(0), TINY_MMDIT)
    x, t, ctx, pooled = _inputs()
    out = mmdit_apply(p, x, t, ctx, pooled, TINY_MMDIT)
    assert out.shape == x.shape
    assert float(jnp.abs(out).max()) == 0.0


def _nonzero_params(seed=1):
    p = init_mmdit_params(jax.random.PRNGKey(seed), TINY_MMDIT)
    # un-zero the AdaLN/head params so the function is nontrivial
    k = jax.random.PRNGKey(seed + 100)

    def fill(t):
        nonlocal k
        k, sub = jax.random.split(k)
        return jnp.where(jnp.abs(t) > 0, t,
                         jax.random.normal(sub, t.shape) * 0.02)

    return jax.tree_util.tree_map(fill, p)


def test_mmdit_conditioning_sensitivity():
    p = _nonzero_params()
    x, t, ctx, pooled = _inputs()
    o1 = mmdit_apply(p, x, t, ctx, pooled, TINY_MMDIT)
    o2 = mmdit_apply(p, x, t + 100.0, ctx, pooled, TINY_MMDIT)
    o3 = mmdit_apply(p, x, t, ctx * 1.5, pooled, TINY_MMDIT)
    o4 = mmdit_apply(p, x, t, ctx, pooled * 1.5, TINY_MMDIT)
    assert np.isfinite(np.asarray(o1)).all()
    for other in (o2, o3, o4):
        assert float(jnp.abs(o1 - other).max()) > 0


def test_mmdit_converter_roundtrip():
    from adaface_tpu.tools.convert_mmdit import (convert_mmdit,
                                                 export_mmdit_to_diffusers)

    cfg = dataclasses.replace(TINY_MMDIT, qk_norm=True)
    p0 = init_mmdit_params(jax.random.PRNGKey(2), cfg)
    sd = export_mmdit_to_diffusers(p0, cfg)
    # last block is context_pre_only: no context out-proj keys
    assert f"transformer_blocks.{cfg.depth - 1}.attn.to_add_out.weight" \
        not in sd
    assert "transformer_blocks.0.attn.to_add_out.weight" in sd
    p1 = convert_mmdit(sd, cfg)
    f0, t0 = jax.tree_util.tree_flatten(p0)
    f1, t1 = jax.tree_util.tree_flatten(p1)
    assert t0 == t1
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_rectified_flow_matches_numpy_reference():
    from adaface_tpu.ops.samplers import rectified_flow_sample

    a = -0.3

    def model_fn(x, t, ctx):
        return a * x

    x_T = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 4))
    n, shift = 5, 3.0
    got = np.asarray(rectified_flow_sample(
        model_fn, x_T, cond_ctx={}, num_inference_steps=n, shift=shift))

    sig = _diffusers_flow_match_sigmas(n, shift)
    sig_next = np.append(sig[1:], 0.0)
    x = np.asarray(x_T, np.float64)
    for i in range(n):
        x = x + (a * x) * (sig_next[i] - sig[i])
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)


def _diffusers_flow_match_sigmas(n: int, shift: float,
                                 n_train: int = 1000) -> np.ndarray:
    """FlowMatchEulerDiscreteScheduler grid, transcribed independently:
    __init__ builds the train grid sigmas=linspace(1,1/1000) and applies
    the shift transform once; set_timesteps linspaces t between
    sigma_to_t of the shifted endpoints and applies the shift AGAIN."""
    train_sigmas = np.linspace(1, n_train, n_train)[::-1] / n_train
    train_sigmas = shift * train_sigmas / (1 + (shift - 1) * train_sigmas)
    # _sigma_to_t is sigma * n_train; timesteps linspace in t-space
    t = np.linspace(train_sigmas[0] * n_train, train_sigmas[-1] * n_train, n)
    s = t / n_train
    return shift * s / (1 + (shift - 1) * s)


def test_rectified_flow_sigma_grid_matches_diffusers_schedule():
    """The sampler's internal grid must match the diffusers scheduler:
    σ_max = 1 and σ_min derives from 1/1000 (≈0.009 at shift 3), NOT
    1/num_inference_steps (which would put the last model evaluation at
    σ≈0.10 and deviate from the reference trajectory)."""
    from adaface_tpu.ops.samplers import rectified_flow_sample

    for n, shift in [(28, 3.0), (5, 3.0), (10, 1.0)]:
        ref_sig = _diffusers_flow_match_sigmas(n, shift)
        seen = []

        def model_fn(x, t, ctx):
            seen.append(t)
            return jnp.zeros_like(x)

        with jax.disable_jit():
            rectified_flow_sample(model_fn, jnp.zeros((1, 4, 4, 4)),
                                  cond_ctx={}, num_inference_steps=n,
                                  shift=shift)
        got_sig = np.asarray([float(t[0]) / 1000.0 for t in seen])
        np.testing.assert_allclose(got_sig, ref_sig, rtol=1e-5, atol=1e-7)
        assert abs(got_sig[0] - 1.0) < 1e-6
        assert got_sig[-1] < 0.02  # ≈0.009 at shift 3, not ~0.1


@pytest.fixture(scope="module")
def sd3_modules():
    from adaface_tpu.inference.sd3_pipeline import SD3PipelineModules

    return SD3PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32, mmdit_cfg=TINY_MMDIT,
        vae_cfg=TINY_VAE16, text_cfg=TINY_TEXT, text2_cfg=TINY_TEXT2,
        t5_len=8)


def test_sd3_pipeline_smoke(sd3_modules):
    from adaface_tpu.inference.sd3_pipeline import SD3Pipeline

    # random init zeroes the AdaLN params → make the mmdit nontrivial
    sd3_modules.mmdit = _nonzero_params()
    pipe = SD3Pipeline(sd3_modules, dtype=jnp.float32)
    img = pipe("a cat wearing a hat", num_inference_steps=2,
               guidance_scale=5.0, height=32, width=32)
    assert img.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()
    # context = [clip(77) ‖ t5(8)] tokens at the joint width
    ctx, pooled = pipe.encode_prompt(["x"])
    assert ctx.shape == (1, 85, TINY_MMDIT.context_dim)
    assert pooled.shape == (1, TINY_MMDIT.pooled_dim)
    # clip segment zero-padded from 2*24-proj... hidden concat = D1+D2=72
    assert float(jnp.abs(ctx[:, :77, D1 + D2:]).max()) == 0.0


def test_wrapper_text2img3(sd3_modules):
    from adaface_tpu.id2ada.face_backends import DeterministicBackend
    from adaface_tpu.id2ada.face_id_to_ada_prompt import Arc2FaceID2AdaPrompt
    from adaface_tpu.inference.wrapper import AdaFaceWrapper
    from adaface_tpu.models.clip import CLIPVisionConfig

    sd3_modules.mmdit = _nonzero_params()
    enc = Arc2FaceID2AdaPrompt(
        jax.random.PRNGKey(1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=CLIPVisionConfig(
            hidden_size=D1, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=224, patch_size=32),
        sbg_clip_cfg=TINY_TEXT,
        text_cfg=TINY_TEXT,
        output_dim=D1,
    )
    w = AdaFaceWrapper("text2img3", sd3_modules, enc,
                       num_inference_steps=2, dtype=jnp.float32)
    imgs = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32)
    ada = w.prepare_adaface_embeddings(images=imgs)
    assert ada is not None
    out = w.forward("portrait, oil painting", num_images=1,
                    num_inference_steps=2, height=32, width=32)
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()
