"""Int8 PTQ serving path (ops/quant.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaface_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
from adaface_tpu.ops.quant import (
    int8_conv2d,
    int8_dense,
    quantize_unet_params,
    quantize_weight,
)

CFG = UNetConfig(
    in_channels=4, out_channels=4, block_channels=(32, 64),
    layers_per_block=1, cross_attn_dim=16, num_heads=2, norm_groups=8,
    down_has_attn=(True, False), up_has_attn=(False, True),
    time_embed_dim=64,
)


def test_quantize_weight_roundtrip():
    rs = np.random.RandomState(0)
    w = rs.randn(3, 3, 8, 16).astype(np.float32)
    w_q, scale = quantize_weight(jnp.asarray(w))
    assert w_q.dtype == jnp.int8 and scale.shape == (16,)
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)
    # max per-channel quantization error is scale/2
    assert np.abs(deq - w).max() <= np.asarray(scale).max() / 2 + 1e-6


def test_int8_conv_close_to_fp():
    rs = np.random.RandomState(1)
    p = {"w": jnp.asarray(rs.randn(3, 3, 8, 16).astype(np.float32)) * 0.1,
         "b": jnp.asarray(rs.randn(16).astype(np.float32)) * 0.1}
    x = jnp.asarray(rs.randn(2, 8, 8, 8).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
    w_q, scale = quantize_weight(p["w"])
    got = int8_conv2d({"w_q": w_q, "w_scale": scale, "b": p["b"]}, x)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.02, rel


def test_int8_dense_close_to_fp():
    rs = np.random.RandomState(2)
    w = jnp.asarray(rs.randn(32, 16).astype(np.float32)) * 0.1
    b = jnp.asarray(rs.randn(16).astype(np.float32)) * 0.1
    x = jnp.asarray(rs.randn(4, 32).astype(np.float32))
    ref = x @ w + b
    w_q, scale = quantize_weight(w)
    got = int8_dense({"w_q": w_q, "w_scale": scale, "b": b}, x)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(
        np.asarray(ref)).max()
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def tiny_unet():
    params = init_unet_params(jax.random.PRNGKey(0), CFG)
    return params


def test_quantized_unet_close_to_fp(tiny_unet):
    qparams = quantize_unet_params(tiny_unet)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 4, 16, 16).astype(np.float32))
    t = jnp.asarray([37], jnp.int32)
    ctx = jnp.asarray(rs.randn(1, 7, 16).astype(np.float32))
    ref, _ = unet_apply(tiny_unet, x, t, ctx, cfg=CFG)
    got, _ = unet_apply(qparams, x, t, ctx, cfg=CFG)
    ref, got = np.asarray(ref), np.asarray(got)
    # e2e int8 drift stays small relative to the output range
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 0.15, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr


def test_skip_subtrees_stay_fp(tiny_unet):
    qparams = quantize_unet_params(tiny_unet)
    assert "w" in qparams["conv_in"] and "w_q" not in qparams["conv_in"]
    assert "w" in qparams["conv_out"]
    assert "w" in qparams["time_mlp"]["fc1"]
    # a resnet conv did get quantized
    blk = qparams["down_blocks"][0]["resnets"][0]
    assert "w_q" in blk["conv1"] and blk["conv1"]["w_q"].dtype == jnp.int8


def test_quantized_unet_jits(tiny_unet):
    qparams = quantize_unet_params(tiny_unet)
    f = jax.jit(lambda p, x, t, c: unet_apply(p, x, t, c, cfg=CFG)[0])
    rs = np.random.RandomState(4)
    out = f(qparams, jnp.asarray(rs.randn(1, 4, 16, 16), jnp.float32),
            jnp.asarray([5], jnp.int32),
            jnp.asarray(rs.randn(1, 7, 16), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_quantize_unet_option():
    from adaface_tpu.inference.pipeline import (DiffusionPipeline,
                                                PipelineModules)
    from tests.test_inference import TINY_TEXT, TINY_UNET, TINY_VAE

    modules = PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT)
    pipe = DiffusionPipeline(modules, dtype=jnp.float32, quantize_unet=True)
    # original modules object is untouched (shared fixtures stay fp)
    assert "w" in modules.unet["down_blocks"][0]["resnets"][0]["conv1"]
    assert "w_q" in pipe.m.unet["down_blocks"][0]["resnets"][0]["conv1"]
    img = pipe("a photo", num_inference_steps=2, guidance_scale=4.0,
               height=128, width=128)
    assert np.isfinite(np.asarray(img)).all()
