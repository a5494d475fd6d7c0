"""Small tensor utilities shared across the framework.

JAX equivalents of the reference's `adaface/util.py` / `ldm/util.py` helpers:
- perturb_tensor   (`adaface/util.py:30-53`)  — relative-std noise injection
- gradient_scale   (`adaface/util.py:97-141` GradientScaler) — identity fwd,
  scaled grad bwd, as a custom_vjp instead of an autograd Function
- ortho_subtract   (`ldm/util.py:296`) — remove the component of a along b
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def perturb_tensor(
    rng: jax.Array,
    x: jax.Array,
    perturb_std: float,
    std_is_relative: bool = True,
    keep_norm: bool = False,
) -> jax.Array:
    """Add gaussian noise to x; std relative to x's own std by default.

    With keep_norm, rescale the result back to x's Frobenius norm so only the
    direction is perturbed.
    """
    if perturb_std == 0.0:
        return x
    std = perturb_std * jnp.std(x) if std_is_relative else jnp.asarray(perturb_std)
    noise = jax.random.normal(rng, x.shape, x.dtype) * std.astype(x.dtype)
    out = x + noise
    if keep_norm:
        out = out * (jnp.linalg.norm(x) / (jnp.linalg.norm(out) + 1e-8))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_scale(x, scale: float):
    """Identity in the forward pass; multiplies the cotangent by `scale`.

    scale=0 is equivalent to stop_gradient; scale>1 amplifies the gradient
    signal into `x` (used for e.g. the 5x hidden-state-layer-weight grads,
    `subj_basis_generator.py:772-789`, and 10x cross_attn_scale_factor grads).
    """
    return x


def _gs_fwd(x, scale):
    return x, None


def _gs_bwd(scale, _, g):
    return (jax.tree_util.tree_map(lambda t: t * scale, g),)


gradient_scale.defvjp(_gs_fwd, _gs_bwd)


def gen_gradient_scaler(scale: float):
    """Returns fn(x) applying gradient_scale; scale<=0 → stop_gradient."""
    if scale <= 0:
        return jax.lax.stop_gradient
    if scale == 1:
        return lambda x: x
    return lambda x: gradient_scale(x, float(scale))


def ortho_subtract(a: jax.Array, b: jax.Array, b_discount: float = 1.0,
                   on_last_n_dims: int = 1, eps: float = 1e-6) -> jax.Array:
    """a minus (b_discount ×) its projection onto b, over the last
    on_last_n_dims axes (`ortho_subtract`, `ldm/util.py:296-332`)."""
    if on_last_n_dims > 1:
        a, b = jnp.broadcast_arrays(a, b)
        shape = a.shape
        a = a.reshape(*shape[:-on_last_n_dims], -1)
        b = b.reshape(*shape[:-on_last_n_dims], -1)
        out = ortho_subtract(a, b, b_discount=b_discount, eps=eps)
        return out.reshape(shape)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    norm_sq = jnp.sum(b * b, axis=-1, keepdims=True)
    return a - dot / (norm_sq + eps) * b * b_discount


def anneal_value(training_percent: float, final_percent: float,
                 value_range: tuple[float, float]):
    """Linear annealing from value_range[0] toward value_range[1]
    (`ldm/util.py:1242-1252`). NOTE reference semantics: the slope is
    `(v_final - v_init) * training_percent` (NOT normalized by
    final_percent); once training_percent >= final_percent the value
    clamps to v_final."""
    v_init, v_final = value_range
    if training_percent < final_percent:
        return v_init + (v_final - v_init) * training_percent
    return v_final


def anneal_perturb_embedding(
    rng: jax.Array,
    embeddings: jax.Array,
    training_percent: float,
    begin_std_range: tuple[float, float],
    end_std_range: tuple[float, float] | None,
    perturb_prob: float,
    std_is_relative: bool = True,
    keep_norm: bool = False,
) -> jax.Array:
    """Probabilistic, annealed embedding perturbation
    (`anneal_perturb_embedding`, `ldm/util.py:1569-1597`): std sampled
    from a range that anneals over training; applied with perturb_prob."""
    k1, k2, k3 = jax.random.split(rng, 3)
    if end_std_range is not None:
        lo = anneal_value(training_percent, 1.0,
                          (begin_std_range[0], end_std_range[0]))
        hi = anneal_value(training_percent, 1.0,
                          (begin_std_range[1], end_std_range[1]))
    else:
        lo, hi = begin_std_range
    std = jax.random.uniform(k1, (), minval=lo, maxval=hi)
    noise_std = std * (jnp.std(embeddings) if std_is_relative else 1.0)
    noise = jax.random.normal(k2, embeddings.shape, embeddings.dtype)
    out = embeddings + noise * noise_std.astype(embeddings.dtype)
    if keep_norm:
        out = out * (jnp.linalg.norm(embeddings) / (jnp.linalg.norm(out) + 1e-8))
    apply = jax.random.bernoulli(k3, perturb_prob)
    return jnp.where(apply, out, embeddings)
