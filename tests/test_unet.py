import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.models.unet import (
    SD15_UNET,
    AttnRuntime,
    UNetConfig,
    init_attn_lora_params,
    init_ffn_lora_params,
    init_unet_params,
    timestep_embedding,
    unet_apply,
)

# A tiny config that keeps the SD1.5 topology (4 blocks, attn pattern,
# 3-layer last up block) but is cheap on CPU.
TINY = UNetConfig(
    block_channels=(32, 64, 64, 64),
    cross_attn_dim=48,
    num_heads=4,
    norm_groups=8,
    lora_rank=8,
    lora_alpha=1,
)


@pytest.fixture(scope="module")
def tiny_unet():
    return init_unet_params(jax.random.PRNGKey(0), TINY)


def _inputs(b=2, s=16, hw=32):
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 4, hw, hw))
    t = jnp.array([10, 500][:b])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, s, TINY.cross_attn_dim))
    return x, t, ctx


def test_unet_forward_shape(tiny_unet):
    x, t, ctx = _inputs()
    eps, cap = unet_apply(tiny_unet, x, t, ctx, TINY)
    assert eps.shape == x.shape
    assert np.isfinite(np.asarray(eps)).all()
    assert cap == {}


def test_unet_jit_and_grad(tiny_unet):
    x, t, ctx = _inputs(b=1)

    @jax.jit
    def loss(params, x, t, ctx):
        eps, _ = unet_apply(params, x, t, ctx, TINY)
        return (eps**2).mean()

    g = jax.grad(loss)(tiny_unet, x, t, ctx)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter must receive gradient somewhere
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_capture_layers(tiny_unet):
    x, t, ctx = _inputs()
    eps, cap = unet_apply(
        tiny_unet, x, t, ctx, TINY, rt=AttnRuntime(capture=True)
    )
    assert set(cap.keys()) >= {"q", "q2", "k", "v", "attn", "attnscore", "attn_out", "outfeat"}
    assert sorted(cap["attn"].keys()) == [22, 23, 24]
    b, s = 2, 16
    c = TINY.block_channels[0]
    n = 32 * 32
    assert cap["q"][22].shape == (b, c, n)
    assert cap["attn"][23].shape == (b, TINY.num_heads, n, s)
    assert cap["outfeat"][24].shape == (b, c, 32, 32)
    # capture must not change eps
    eps0, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps0), atol=1e-5)


def test_attn_lora_zero_B_is_identity(tiny_unet):
    x, t, ctx = _inputs()
    lora = init_attn_lora_params(jax.random.PRNGKey(3), TINY)
    eps0, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps1, _ = unet_apply(
        tiny_unet, x, t, ctx, TINY,
        rt=AttnRuntime(use_attn_lora=True, q_lora_updates_query=True),
        attn_lora=lora,
    )
    # B=0 but mag=1 != ||W||_col, so DoRA rescales columns: outputs differ
    # from base but must stay finite (exact identity is covered by
    # test_attn_lora_exact_identity_with_matched_mag)
    assert np.isfinite(np.asarray(eps1)).all()
    assert np.abs(np.asarray(eps1) - np.asarray(eps0)).max() > 1e-6


def test_attn_lora_exact_identity_with_matched_mag(tiny_unet):
    """With B=0 and mag set to the base column norms, DoRA == base layer."""
    x, t, ctx = _inputs(b=1)
    lora = init_attn_lora_params(jax.random.PRNGKey(3), TINY)
    # up_blocks[-1] attentions
    for li, label in enumerate(("22", "23", "24")):
        attn = tiny_unet["up_blocks"][-1]["attentions"][li]["block"]["attn2"]
        for name, pkey in (("q", "q"), ("out", "o")):
            w = attn[pkey]["w"]
            lora[label][name]["mag"] = jnp.linalg.norm(w, axis=0)
    eps0, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps1, _ = unet_apply(
        tiny_unet, x, t, ctx, TINY,
        rt=AttnRuntime(use_attn_lora=True, q_lora_updates_query=True),
        attn_lora=lora,
    )
    np.testing.assert_allclose(np.asarray(eps1), np.asarray(eps0), atol=1e-4)


def test_ffn_lora_adapters(tiny_unet):
    x, t, ctx = _inputs(b=1)
    ffn = init_ffn_lora_params(jax.random.PRNGKey(4), TINY, lora_rank=8)
    # match magnitudes for identity check
    for ad in ffn.values():
        for ri in ("1", "2"):
            res = tiny_unet["up_blocks"][-1]["resnets"][int(ri)]
            for conv in ("conv1", "conv2"):
                w = res[conv]["w"]
                ad[ri][conv]["mag"] = jnp.sqrt((w**2).sum(axis=(0, 1, 2)))
    eps0, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps1, _ = unet_apply(
        tiny_unet, x, t, ctx, TINY,
        rt=AttnRuntime(use_ffn_lora=True, ffn_adapter="recon_loss"),
        ffn_lora=ffn,
    )
    np.testing.assert_allclose(np.asarray(eps1), np.asarray(eps0), atol=1e-4)


def test_img_mask_changes_self_attention(tiny_unet):
    x, t, ctx = _inputs()
    mask = jnp.ones((2, 1, 32, 32)).at[:, :, :, 16:].set(0.0)
    eps0, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps1, _ = unet_apply(tiny_unet, x, t, ctx, TINY, img_mask=mask)
    assert np.abs(np.asarray(eps1) - np.asarray(eps0)).max() > 1e-4


def test_mix_attn_mats_makes_halves_consistent(tiny_unet):
    """With mixed attention matrices, sc/mc halves share attention probs."""
    x, t, ctx = _inputs(b=2)
    _, cap = unet_apply(
        tiny_unet, x, t, ctx, TINY,
        rt=AttnRuntime(capture=True, mix_attn_mats_in_batch=True),
    )
    a = np.asarray(cap["attn"][22])
    np.testing.assert_allclose(a[0], a[1], atol=1e-5)


def test_normalize_cross_attn_with_subj_mask(tiny_unet):
    x, t, ctx = _inputs(b=2)
    lora = init_attn_lora_params(jax.random.PRNGKey(3), TINY)
    subj = jnp.zeros((2, 16)).at[:, 4:8].set(1.0)
    eps0, _ = unet_apply(tiny_unet, x, t, ctx, TINY)
    eps1, cap = unet_apply(
        tiny_unet, x, t, ctx, TINY,
        rt=AttnRuntime(capture=True, normalize_cross_attn=True,
                       use_attn_lora=True),
        attn_lora=lora, subj_mask=subj,
    )
    assert np.isfinite(np.asarray(eps1)).all()
    assert np.abs(np.asarray(eps1) - np.asarray(eps0)).max() > 1e-5


def test_timestep_embedding_flip_sin_to_cos():
    emb = timestep_embedding(jnp.array([0]), 320)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :160]), np.ones(160), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), np.zeros(160), atol=1e-6)


def test_sd15_full_size_param_count():
    """Full SD1.5 UNet should have ~860M params (diffusers: 859.5M)."""
    params = init_unet_params(jax.random.PRNGKey(0), SD15_UNET)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert 8.4e8 < n < 8.8e8, n


def test_unet_grad_through_bf16_weights(tiny_unet):
    """Grad w.r.t. a f32 input through a bf16 UNet (the training setup:
    frozen bf16 UNet, f32 trainable upstream). Regression for the
    lax.conv transpose dtype mismatch when conv used
    preferred_element_type=f32."""
    bf16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, tiny_unet)
    x, t, _ = _inputs(b=1)

    def loss(ctx):
        eps, _ = unet_apply(bf16, x, t, ctx.astype(jnp.bfloat16), TINY)
        return (eps.astype(jnp.float32) ** 2).mean()

    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, TINY.cross_attn_dim))
    g = jax.grad(loss)(ctx)
    assert g.dtype == ctx.dtype
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
