"""Fused LayerNorm Pallas kernel for the UNet transformer blocks.

XLA's LayerNorm at the SD1.5 hot shape ([64, 4096, 320] bf16) reads the
activation multiple times (fp32 convert + mean pass + var pass +
normalize); measured 3.2 ms vs a ~0.4 ms bandwidth bound on v5e. This
kernel computes row statistics and the normalized affine output in one
VMEM residency: lane-axis mean/mean-of-squares, rsqrt, scale/bias.

Backward follows the flash-attention/fused-GN pattern: custom VJP that
recomputes through the XLA reference (the kernel is forward-only); LoRA
gradients in the frozen UNet flow through LayerNorm, so the VJP must be
exact, which recompute guarantees.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # [br, C]
    mean = x.mean(axis=-1, keepdims=True)
    var = (x * x).mean(axis=-1, keepdims=True) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _ln_ref(x2, scale, bias, eps):
    xf = x2.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x2.dtype)


def _ln_fwd_tpu(x2, scale, bias, eps):
    r, c = x2.shape
    # keep the in-block ≤ ~1 MB (see ops/fused_gn._pick_block_rows)
    budget = 1024 * 1024
    br = max(8, min(1024, budget // max(c * x2.dtype.itemsize, 1)) // 8 * 8)
    br = min(_round_up(r, 8), br)
    rp = _round_up(r, br)
    xp = jnp.pad(x2, ((0, rp - r), (0, 0))) if rp != r else x2
    yp = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, c), x2.dtype),
    )(xp, scale[None].astype(jnp.float32), bias[None].astype(jnp.float32))
    return yp[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x2, scale, bias, eps, use_pallas):
    if use_pallas:
        return _ln_fwd_tpu(x2, scale, bias, eps)
    return _ln_ref(x2, scale, bias, eps)


def _ln_fwd(x2, scale, bias, eps, use_pallas):
    return _ln(x2, scale, bias, eps, use_pallas), (x2, scale, bias)


def _ln_bwd(eps, use_pallas, res, g):
    x2, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _ln_ref(x, s, b, eps), x2, scale, bias)
    return vjp(g)


_ln.defvjp(_ln_fwd, _ln_bwd)


def fused_layer_norm(
    x: jax.Array,  # [..., C]
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    use_pallas: bool | None = None,
) -> jax.Array:
    """LayerNorm over the last axis, single-pass Pallas kernel on TPU."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    return _ln(x2, scale, bias, eps, use_pallas).reshape(shape)
