"""Temporal motion modules + video pipeline (AdaFace-Animate path).

Covers: zero-init identity with the image UNet, temporal mixing across
frames, jit+grad, the AnimateDiff checkpoint key mapping, the end-to-end
video pipeline, and the wrapper's text2video route.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.models.motion import (
    MotionConfig,
    init_motion_params,
    motion_apply,
    sinusoidal_position_encoding,
)
from adaface_tpu.models.unet import UNetConfig, init_unet_params, unet_apply

TINY = UNetConfig(
    block_channels=(32, 64, 64, 64),
    cross_attn_dim=48,
    num_heads=4,
    norm_groups=8,
    lora_rank=8,
    lora_alpha=1,
)
MTINY = MotionConfig(num_heads=2, norm_groups=8, max_frames=8)


@pytest.fixture(scope="module")
def tiny_unet():
    return init_unet_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def tiny_motion():
    return init_motion_params(jax.random.PRNGKey(1), TINY, MTINY)


def _video_inputs(v=1, f=4, s=8, hw=32):
    b = v * f
    x = jax.random.normal(jax.random.PRNGKey(2), (b, 4, hw, hw))
    t = jnp.full((b,), 100, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (b, s, TINY.cross_attn_dim))
    return x, t, ctx


def test_pe_shape_and_range():
    pe = sinusoidal_position_encoding(16, 32)
    assert pe.shape == (16, 32)
    assert float(jnp.abs(pe).max()) <= 1.0 + 1e-6
    # position 0: sin terms 0, cos terms 1
    np.testing.assert_allclose(np.asarray(pe[0, 0::2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pe[0, 1::2]), 1.0, atol=1e-7)


def test_zero_init_is_identity_with_image_unet(tiny_unet, tiny_motion):
    """proj_out starts at zero → the video UNet equals the image UNet
    frame-by-frame (AnimateDiff zero_initialize semantics)."""
    x, t, ctx = _video_inputs()
    eps_img, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps_vid, _ = unet_apply(tiny_unet, x, t, ctx, TINY,
                            motion=tiny_motion, num_frames=4,
                            motion_cfg=MTINY)
    np.testing.assert_allclose(np.asarray(eps_img), np.asarray(eps_vid),
                               atol=1e-5)


def _activate(motion):
    """Give each module-level proj_out a random nonzero weight so the
    (random-init) temporal attention reaches the residual stream.  The
    q/k/v weights must stay random: a constant-fill matrix makes q/k/v
    depend only on the per-frame positional encoding (channel sums of
    LayerNormed features are exactly zero), which kills data mixing."""

    def f(path, a):
        keys = [getattr(p, "key", None) for p in path]
        if keys[-2:] == ["proj_out", "w"] and a.ndim == 2:
            return jax.random.normal(jax.random.PRNGKey(7), a.shape) * 0.05
        return a

    return jax.tree_util.tree_map_with_path(f, motion)


def test_frames_interact_when_active(tiny_unet, tiny_motion):
    motion = _activate(tiny_motion)
    x, t, ctx = _video_inputs(f=4)
    eps, _ = unet_apply(tiny_unet, x, t, ctx, TINY, motion=motion,
                        num_frames=4, motion_cfg=MTINY)
    # perturb ONLY frame 3; frame 0's output must change (temporal mixing)
    x2 = x.at[3].add(1.0)
    eps2, _ = unet_apply(tiny_unet, x2, t, ctx, TINY, motion=motion,
                         num_frames=4, motion_cfg=MTINY)
    assert float(jnp.abs(eps2[0] - eps[0]).max()) > 1e-6
    # without motion there is no cross-frame path
    eps3, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps4, _ = unet_apply(tiny_unet, x2, t, ctx, TINY)
    np.testing.assert_allclose(np.asarray(eps3[0]), np.asarray(eps4[0]),
                               atol=1e-6)


def test_videos_in_batch_are_independent(tiny_unet, tiny_motion):
    """Frames are grouped per video: video 1's frames never leak into
    video 0."""
    motion = _activate(tiny_motion)
    x, t, ctx = _video_inputs(v=2, f=2)
    eps, _ = unet_apply(tiny_unet, x, t, ctx, TINY, motion=motion,
                        num_frames=2, motion_cfg=MTINY)
    x2 = x.at[2].add(1.0)  # frame 0 of video 1
    eps2, _ = unet_apply(tiny_unet, x2, t, ctx, TINY, motion=motion,
                         num_frames=2, motion_cfg=MTINY)
    np.testing.assert_allclose(np.asarray(eps[:2]), np.asarray(eps2[:2]),
                               atol=1e-6)
    assert float(jnp.abs(eps2[2] - eps[2]).max()) > 1e-6


def test_motion_jit_and_grad(tiny_motion):
    mm = tiny_motion["mid"]
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8, 64))

    @jax.jit
    def loss(p, x):
        return jnp.sum(motion_apply(p, x, num_frames=4, mcfg=MTINY) ** 2)

    g = jax.grad(loss)(mm, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient flows into the temporal attention despite zero proj_out
    # (proj_out's own grad is nonzero; upstream q/k/v grads are zero until
    # proj_out becomes nonzero — check proj_out specifically)
    assert float(jnp.abs(g["proj_out"]["w"]).max()) > 0


def test_animatediff_converter_roundtrip():
    torch = pytest.importorskip("torch")
    c = 64
    sd = {}

    def lin(prefix, cin, cout, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(cout)

    def norm(prefix, ch):
        sd[f"{prefix}.weight"] = torch.randn(ch)
        sd[f"{prefix}.bias"] = torch.randn(ch)

    def module(prefix):
        tt = f"{prefix}.temporal_transformer"
        norm(f"{tt}.norm", c)
        lin(f"{tt}.proj_in", c, c)
        tb = f"{tt}.transformer_blocks.0"
        for a in range(2):
            ab = f"{tb}.attention_blocks.{a}"
            lin(f"{ab}.to_q", c, c, bias=False)
            lin(f"{ab}.to_k", c, c, bias=False)
            lin(f"{ab}.to_v", c, c, bias=False)
            lin(f"{ab}.to_out.0", c, c)
            norm(f"{tb}.norms.{a}", c)
            sd[f"{ab}.pos_encoder.pe"] = torch.randn(1, 32, c)  # skipped
        lin(f"{tb}.ff.net.0.proj", c, c * 8)
        lin(f"{tb}.ff.net.2", c * 4, c)
        norm(f"{tb}.ff_norm", c)
        lin(f"{tt}.proj_out", c, c)

    for b in range(4):
        for l in range(2):
            module(f"down_blocks.{b}.motion_modules.{l}")
        for l in range(3):
            module(f"up_blocks.{b}.motion_modules.{l}")
    module("mid_block.motion_modules.0")

    from adaface_tpu.tools.convert_motion import convert_motion_modules

    npsd = {k: v.numpy() for k, v in sd.items()
            if not k.endswith("pos_encoder.pe")}
    motion = convert_motion_modules(npsd)
    # tree structure matches init_motion_params for a uniform-channel UNet
    ref = init_motion_params(
        jax.random.PRNGKey(0),
        UNetConfig(block_channels=(c, c, c, c), norm_groups=8), MTINY)
    assert (jax.tree_util.tree_structure(motion)
            == jax.tree_util.tree_structure(ref))
    # linear transpose: torch [out,in] → ours [in,out]
    w_t = sd["mid_block.motion_modules.0.temporal_transformer"
             ".proj_in.weight"].numpy()
    np.testing.assert_allclose(np.asarray(motion["mid"]["proj_in"]["w"]),
                               w_t.T, atol=1e-6)
    # converted module runs
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, c))
    y = motion_apply(motion["mid"], x, num_frames=2,
                     mcfg=MotionConfig(num_heads=2, norm_groups=8))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_video_pipeline_end_to_end():
    from adaface_tpu.inference.pipeline import PipelineModules
    from adaface_tpu.inference.video_pipeline import VideoPipeline
    from adaface_tpu.models.clip import CLIPTextConfig
    from adaface_tpu.models.vae import VAEConfig

    text_cfg = CLIPTextConfig(hidden_size=48, num_layers=2, num_heads=2,
                              intermediate_size=96)
    unet_cfg = UNetConfig(block_channels=(16, 32, 32, 32), cross_attn_dim=48,
                          num_heads=2, norm_groups=8, lora_rank=4,
                          lora_alpha=1)
    vae_cfg = VAEConfig(base_ch=16, ch_mult=(1, 2, 2), num_res_blocks=1,
                        norm_groups=8)
    modules = PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32, unet_cfg=unet_cfg,
        vae_cfg=vae_cfg, text_cfg=text_cfg)
    mcfg = MotionConfig(num_heads=2, norm_groups=8)
    motion = init_motion_params(jax.random.PRNGKey(1), unet_cfg, mcfg)
    pipe = VideoPipeline(modules, motion, motion_cfg=mcfg, dtype=jnp.float32)
    vid = pipe("a person waving", num_frames=3, num_inference_steps=2,
               guidance_scale=5.0, height=64, width=64, decode_chunk=2)
    assert vid.shape == (1, 3, 3, 64, 64)
    assert np.isfinite(np.asarray(vid)).all()
    assert 0.0 <= float(vid.min()) and float(vid.max()) <= 1.0


def test_gif_export(tmp_path):
    pytest.importorskip("PIL")
    from adaface_tpu.inference.pipeline import PipelineModules
    from adaface_tpu.inference.video_pipeline import VideoPipeline

    vid = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 16)),
                   0, 1)
    path = VideoPipeline.to_gif(None, vid, str(tmp_path / "clip.gif"), fps=4)
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0
