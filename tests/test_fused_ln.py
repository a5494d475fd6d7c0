"""Fused LayerNorm kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.fused_ln import _ln_ref, fused_layer_norm


def test_fused_ln_matches_reference():
    rng = np.random.default_rng(0)
    for shape, dtype in [((4, 96, 40), jnp.float32),
                         ((2, 1000, 320), jnp.bfloat16)]:
        x = jnp.asarray(rng.normal(size=shape) * 3 + 1).astype(dtype)
        scale = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
        bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
        want = _ln_ref(x.reshape(-1, shape[-1]), scale, bias,
                       1e-5).reshape(shape)
        got = fused_layer_norm(x, scale, bias, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=2e-2 if dtype == jnp.bfloat16 else 1e-5)


def test_fused_ln_grads_flow():
    x = jnp.ones((3, 17, 8)) + jnp.arange(8)
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))

    def f(x, s, b):
        return (fused_layer_norm(x, s, b, use_pallas=False) ** 2).sum()

    gx, gs, gb = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
    assert np.isfinite(np.asarray(gx)).all()
    assert gs.shape == (8,) and gb.shape == (8,)
    # LN output of constant-augmented rows: grads wrt bias = 2*sum(y) per ch
    y = fused_layer_norm(x, scale, bias, use_pallas=False)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(2 * y.sum((0, 1))),
                               rtol=1e-4)
