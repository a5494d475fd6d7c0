import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.ops.attention import (
    flash_attention,
    scaled_dot_product_attention,
)


def _rand_qkv(key, b=2, h=2, sq=256, sk=256, d=64, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, sq, d), dtype)
    k = jax.random.normal(k2, (b, h, sk, d), dtype)
    v = jax.random.normal(k3, (b, h, sk, d), dtype)
    return q, k, v


def test_sdpa_matches_naive_softmax():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), sq=16, sk=24, d=8)
    out = scaled_dot_product_attention(q, k, v)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    p = jax.nn.softmax(jnp.asarray(s), axis=-1)
    expect = np.einsum("bhqk,bhkd->bhqd", np.asarray(p), np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_sdpa_causal():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), sq=8, sk=8, d=4)
    out = scaled_dot_product_attention(q, k, v, causal=True)
    # row 0 attends only to key 0
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(v[:, :, 0]), atol=1e-5)


def test_sdpa_kv_mask():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), sq=4, sk=8, d=4)
    mask = jnp.ones((2, 8)).at[:, 4:].set(0.0)
    out = scaled_dot_product_attention(q, k, v, kv_mask=mask)
    expect = scaled_dot_product_attention(q[:, :, :, :], k[:, :, :4], v[:, :, :4])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize("sq,sk,d", [(256, 256, 64), (256, 384, 40),
                                     (130, 77, 40),
                                     # d>=128 keeps the standard-layout
                                     # kernel covered (d<128 routes to the
                                     # transposed kernel)
                                     (256, 256, 128)])
def test_flash_matches_reference(sq, sk, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, h=2, sq=sq, sk=sk, d=d)
    ref = scaled_dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_kv_mask_and_causal():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b=2, h=1, sq=128, sk=128, d=32)
    mask = jnp.ones((2, 128)).at[1, 100:].set(0.0)
    ref = scaled_dot_product_attention(q, k, v, kv_mask=mask, causal=True)
    out = flash_attention(
        q, k, v, kv_mask=mask, causal=True, block_q=128, block_k=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grad_matches_reference_grad():
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b=1, h=1, sq=128, sk=128, d=32)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, block_q=128, block_k=128, interpret=True).sum()

    def loss_ref(q, k, v):
        return scaled_dot_product_attention(q, k, v).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sdpa_return_probs():
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), sq=8, sk=8, d=4)
    out, scores, probs = scaled_dot_product_attention(q, k, v, return_probs=True)
    np.testing.assert_allclose(
        np.asarray(probs.sum(-1)), np.ones((2, 2, 8)), atol=1e-5
    )
    assert scores.shape == (2, 2, 8, 8)
