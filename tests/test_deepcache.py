"""DeepCache-style encoder caching (unet_apply deepcache modes +
ddim_sample integration)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaface_tpu.models.unet import UNetConfig, init_unet_params, unet_apply

CFG = UNetConfig(
    in_channels=4, out_channels=4, block_channels=(32, 64),
    layers_per_block=2, cross_attn_dim=16, num_heads=2, norm_groups=8,
    down_has_attn=(True, False), up_has_attn=(False, True),
    time_embed_dim=64,
)


@pytest.fixture(scope="module")
def setup():
    params = init_unet_params(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 16, 16).astype(np.float32))
    t = jnp.asarray([500, 100], jnp.int32)
    ctx = jnp.asarray(rs.randn(2, 7, 16).astype(np.float32))
    return params, x, t, ctx


def test_collect_matches_plain(setup):
    params, x, t, ctx = setup
    eps_plain, _ = unet_apply(params, x, t, ctx, cfg=CFG)
    eps_col, _, cache = unet_apply(params, x, t, ctx, cfg=CFG,
                                   deepcache="collect")
    np.testing.assert_array_equal(np.asarray(eps_plain), np.asarray(eps_col))
    assert cache.shape[0] == 2 and cache.ndim == 4


def test_shallow_with_fresh_cache_is_exact(setup):
    """A shallow pass fed the cache collected at the SAME (x, t) must
    reproduce the full output bit-for-bit — the shallow path recomputes
    exactly the layers outside the cached trunk."""
    params, x, t, ctx = setup
    eps_full, _, cache = unet_apply(params, x, t, ctx, cfg=CFG,
                                    deepcache="collect")
    eps_sh, _ = unet_apply(params, x, t, ctx, cfg=CFG,
                           deepcache=("shallow", cache))
    np.testing.assert_array_equal(np.asarray(eps_full), np.asarray(eps_sh))


def test_shallow_stale_cache_approximates(setup):
    params, x, t, ctx = setup
    _, _, cache = unet_apply(params, x, t, ctx, cfg=CFG, deepcache="collect")
    t2 = t - 20  # adjacent timestep: encoder features near-identical
    eps_ref, _ = unet_apply(params, x, t2, ctx, cfg=CFG)
    eps_sh, _ = unet_apply(params, x, t2, ctx, cfg=CFG,
                           deepcache=("shallow", cache))
    a, b = np.asarray(eps_ref).ravel(), np.asarray(eps_sh).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.95


def test_pipeline_deepcache_runs():
    from adaface_tpu.inference.pipeline import (DiffusionPipeline,
                                                PipelineModules)
    from tests.test_inference import TINY_TEXT, TINY_UNET, TINY_VAE

    modules = PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT)
    pipe = DiffusionPipeline(modules, dtype=jnp.float32)
    img = pipe("a photo", num_inference_steps=4, guidance_scale=4.0,
               height=128, width=128, deepcache_interval=2)
    assert img.shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(img)).all()
    # interval=0 (off) still works after the cached-graph rebuild
    img2 = pipe("a photo", num_inference_steps=4, guidance_scale=4.0,
                height=128, width=128)
    assert np.isfinite(np.asarray(img2)).all()


def test_deepcache_composes_with_int8():
    from adaface_tpu.inference.pipeline import (DiffusionPipeline,
                                                PipelineModules)
    from tests.test_inference import TINY_TEXT, TINY_UNET, TINY_VAE

    modules = PipelineModules.random_init(
        jax.random.PRNGKey(0), dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT)
    pipe = DiffusionPipeline(modules, dtype=jnp.float32, quantize_unet=True)
    img = pipe("a photo", num_inference_steps=4, guidance_scale=4.0,
               height=128, width=128, deepcache_interval=2)
    assert np.isfinite(np.asarray(img)).all()
