"""Fused batch-norm + activation — the InPlace-ABN equivalent.

The reference's only native extension is InPlace-ABN
(`face_parsing/modules/src/inplace_abn*.cpp/cu`: fused mean/var +
normalize + leaky-ReLU/ELU forward and inverse-activation backward, with a
multi-GPU sync variant via `dist.all_reduce`). On TPU the same fusion is
one Pallas kernel: statistics and normalize+activation happen in a single
VMEM pass per channel block, with fp32 statistics; the distributed "sync"
variant reduces the per-device partial sums with `jax.lax.psum` over the
data axis (SURVEY §2.4: "the sync variant maps to psum over the batch
axis").

A custom VJP recomputes the normalized activations from saved statistics
(the memory-saving trick that motivated "in-place" ABN: no pre-activation
tensor is kept; backward inverts the activation), matching
`inplace_abn.cpp:7-84` semantics.

`fused_bn_act` falls back to a pure-XLA implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sqsum_ref):
    """Accumulate per-channel sum and sum-of-squares over the N·H·W rows.

    grid: (num_row_blocks,); x block [BR, C]; outputs [1, C] accumulated
    across the sequential grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sqsum_ref[:] = jnp.zeros_like(sqsum_ref)

    x = x_ref[:].astype(jnp.float32)
    sum_ref[:] += x.sum(axis=0, keepdims=True)
    sqsum_ref[:] += (x * x).sum(axis=0, keepdims=True)


def _norm_act_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, o_ref,
                     *, slope: float):
    x = x_ref[:].astype(jnp.float32)
    y = (x - mean_ref[:]) * rstd_ref[:] * scale_ref[:] + bias_ref[:]
    y = jnp.where(y >= 0, y, y * slope)  # leaky-ReLU
    o_ref[:] = y.astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fused_bn_act_fwd_tpu(x2, scale, bias, slope, eps, axis_name):
    """x2: [R, C] (rows = N*H*W). Returns (y2, mean, rstd)."""
    r, c = x2.shape
    br = min(_round_up(min(r, 1024), 8), _round_up(r, 8))
    rp = _round_up(r, br)
    xp = jnp.pad(x2, ((0, rp - r), (0, 0)))

    s, ss = pl.pallas_call(
        _stats_kernel,
        grid=(rp // br,),
        in_specs=[pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
    )(xp)

    count = jnp.float32(r)
    if axis_name is not None:
        # sync-BN: reduce partial statistics across the data axis
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
        count = count * jax.lax.psum(jnp.float32(1.0), axis_name)
    mean = s / count
    var = ss / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    yp = pl.pallas_call(
        functools.partial(_norm_act_kernel, slope=slope),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, c), x2.dtype),
    )(xp, mean, rstd, scale[None].astype(jnp.float32),
      bias[None].astype(jnp.float32))
    return yp[:r], mean[0], rstd[0]


def _fused_bn_act_fwd_xla(x2, scale, bias, slope, eps, axis_name):
    xf = x2.astype(jnp.float32)
    s = xf.sum(0, keepdims=True)
    ss = (xf * xf).sum(0, keepdims=True)
    count = jnp.float32(x2.shape[0])
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
        count = count * jax.lax.psum(jnp.float32(1.0), axis_name)
    mean = s / count
    var = ss / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * scale + bias
    y = jnp.where(y >= 0, y, y * slope)
    return y.astype(x2.dtype), mean[0], rstd[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(x2, scale, bias, slope, eps, axis_name, use_pallas):
    y, _, _ = (_fused_bn_act_fwd_tpu if use_pallas
               else _fused_bn_act_fwd_xla)(x2, scale, bias, slope, eps,
                                           axis_name)
    return y


def _fused_fwd(x2, scale, bias, slope, eps, axis_name, use_pallas):
    y, mean, rstd = (_fused_bn_act_fwd_tpu if use_pallas
                     else _fused_bn_act_fwd_xla)(x2, scale, bias, slope, eps,
                                                 axis_name)
    # "in-place" residuals: the activated output + statistics + affine —
    # no pre-activation tensor is kept (the InPlace-ABN memory trick)
    return y, (y, mean, rstd, scale, bias)


def _fused_bwd(slope, eps, axis_name, use_pallas, res, g):
    y, mean, rstd, scale, bias = res
    yf = y.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    # invert the leaky-ReLU from the output (`inplace_abn_cpu.cpp` backward)
    z = jnp.where(yf >= 0, yf, yf / slope)
    dz = jnp.where(yf >= 0, gf, gf * slope)
    safe_scale = jnp.where(jnp.abs(scale) < 1e-12,
                           jnp.float32(1e-12), scale.astype(jnp.float32))
    xhat = (z - bias.astype(jnp.float32)) / safe_scale

    count = jnp.float32(y.shape[0])
    sum_dz = dz.sum(0)
    sum_dz_xhat = (dz * xhat).sum(0)
    if axis_name is not None:
        count = count * jax.lax.psum(jnp.float32(1.0), axis_name)
        sum_dz = jax.lax.psum(sum_dz, axis_name)
        sum_dz_xhat = jax.lax.psum(sum_dz_xhat, axis_name)

    dscale = sum_dz_xhat
    dbias = sum_dz
    dxhat = dz * scale.astype(jnp.float32)
    # standard train-mode BN input gradient
    dx = rstd * (dxhat - sum_dz * scale.astype(jnp.float32) / count
                 - xhat * sum_dz_xhat * scale.astype(jnp.float32) / count)
    return (dx.astype(y.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_bn_act(
    x: jax.Array,  # [N, H, W, C] (NHWC) or [N, C]
    scale: jax.Array,
    bias: jax.Array,
    slope: float = 0.01,
    eps: float = 1e-5,
    axis_name: str | None = None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Fused train-mode BN + leaky-ReLU with the in-place backward:
    residuals are (y, stats, affine) only; the pre-activation tensor is
    reconstructed by inverting the activation. axis_name: psum sync-BN."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    y = _fused(x2, scale, bias, slope, eps, axis_name, use_pallas)
    return y.reshape(shape)
