"""Chunked flash-attention backward vs the full-SDPA reference VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.ops import attention as attn_mod
from adaface_tpu.ops.attention import (
    flash_attention, scaled_dot_product_attention)


def _rand(key, b=1, h=2, sq=128, sk=128, d=16):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, sq, d))
    k = jax.random.normal(ks[1], (b, h, sk, d))
    v = jax.random.normal(ks[2], (b, h, sk, d))
    g = jax.random.normal(ks[3], (b, h, sq, d))
    return q, k, v, g


@pytest.mark.parametrize("chunk", [128, 64, 32])
def test_chunked_bwd_matches_reference(monkeypatch, chunk):
    # force multi-chunk scans even at test sizes
    monkeypatch.setattr(attn_mod, "_pick_bwd_chunk",
                        lambda b, h, sq, sk: chunk)
    q, k, v, g = _rand(jax.random.PRNGKey(0))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, block_q=128, block_k=128,
                                interpret=True) * g).sum()

    def loss_ref(q, k, v):
        return (scaled_dot_product_attention(q, k, v) * g).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_chunked_bwd_with_mask_and_causal(monkeypatch):
    monkeypatch.setattr(attn_mod, "_pick_bwd_chunk",
                        lambda b, h, sq, sk: 64)
    q, k, v, g = _rand(jax.random.PRNGKey(1), sq=128, sk=128)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (1, 128)) > 0.3
            ).astype(jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, kv_mask=mask, causal=True,
                                block_q=128, block_k=128,
                                interpret=True) * g).sum()

    def loss_ref(q, k, v):
        return (scaled_dot_product_attention(
            q, k, v, kv_mask=mask, causal=True) * g).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_pick_bwd_chunk_divides():
    for sq in (4096, 1024, 96, 7):
        c = attn_mod._pick_bwd_chunk(8, 8, sq, 4096)
        assert sq % c == 0 and c >= 1
