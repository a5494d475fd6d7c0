import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops import fused_gn
from adaface_tpu.ops.fused_gn import fused_group_norm_silu


def _naive(x, s, b, g, eps, silu):
    bb, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(bb, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(bb, h, w, c) * s + b
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y


def test_xla_path_matches_naive():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 320))
    s = jax.random.normal(jax.random.PRNGKey(1), (320,)) + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (320,)) * 0.1
    for silu in (True, False):
        out = fused_group_norm_silu(x, s, b, 32, 1e-5, apply_silu=silu,
                                    use_pallas=False)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_naive(x, s, b, 32, 1e-5, silu)),
                                   atol=1e-5)


def test_pallas_interpret_matches():
    from jax.experimental import pallas as pl

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 256))
    s = jnp.ones((256,))
    b = jnp.zeros((256,))
    with mock.patch.object(
            fused_gn.pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)):
        out = fused_group_norm_silu(x, s, b, 32, 1e-5, use_pallas=True)
    ref = fused_group_norm_silu(x, s, b, 32, 1e-5, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_interpret_ragged_rows():
    """N not divisible by the row block (padding path)."""
    from jax.experimental import pallas as pl

    x = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 7, 128))
    s = jax.random.normal(jax.random.PRNGKey(5), (128,)) + 1
    b = jnp.zeros((128,))
    with mock.patch.object(
            fused_gn.pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)):
        out = fused_group_norm_silu(x, s, b, 32, 1e-5, use_pallas=True)
    ref = fused_group_norm_silu(x, s, b, 32, 1e-5, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grads_match_autodiff():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 128))
    s = jax.random.normal(jax.random.PRNGKey(1), (128,)) + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1

    def f1(x, s, b):
        return (fused_group_norm_silu(x, s, b, 32, 1e-5,
                                      use_pallas=False) ** 2).mean()

    def f2(x, s, b):
        return (_naive(x, s, b, 32, 1e-5, True) ** 2).mean()

    g1 = jax.grad(f1, argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(x, s, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
