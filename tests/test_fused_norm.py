import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.fused_norm import fused_bn_act


def _naive(x, scale, bias, slope=0.01, eps=1e-5):
    xf = x.astype(jnp.float32)
    c = x.shape[-1]
    x2 = xf.reshape(-1, c)
    mean = x2.mean(0)
    var = x2.var(0)
    y = (x2 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    y = jnp.where(y >= 0, y, y * slope)
    return y.reshape(x.shape)


def test_forward_matches_naive():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    out = fused_bn_act(x, scale, bias, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_naive(x, scale, bias)), atol=1e-5)


def test_inplace_backward_matches_autodiff():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,)) + 1.5
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.2

    def loss_fused(x, s, b):
        return (fused_bn_act(x, s, b, use_pallas=False) ** 3).mean()

    def loss_naive(x, s, b):
        return (_naive(x, s, b) ** 3).mean()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_pallas_kernel_interpret_matches():
    import functools
    from unittest import mock

    from adaface_tpu.ops import fused_norm
    from jax.experimental import pallas as pl

    x = jax.random.normal(jax.random.PRNGKey(3), (32, 128))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))

    with mock.patch.object(
            fused_norm.pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True)):
        out = fused_bn_act(x, scale, bias, use_pallas=True)
    ref = fused_bn_act(x, scale, bias, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sync_bn_psum():
    """Sync-BN over an 8-device axis equals global BN over the full batch."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))

    def local(x):
        return fused_bn_act(x, scale, bias, axis_name="dp", use_pallas=False)

    f = shard_map(local, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))
    out = f(x)
    ref = fused_bn_act(x, scale, bias, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
