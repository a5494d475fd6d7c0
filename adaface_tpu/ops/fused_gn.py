"""Fused GroupNorm(+SiLU) Pallas kernel for the UNet/VAE hot path.

XLA lowers GroupNorm to convert+reduce fusions that read the activation
twice (statistics pass + normalize pass). This kernel does both in one
VMEM residency per batch row: group statistics are computed with
MXU-friendly indicator-matrix matmuls (no awkward [N, G, C/G] reshapes,
whose trailing dims don't tile), then normalize+affine+SiLU write out.

Backward follows the flash-attention pattern: custom VJP that recomputes
through the XLA reference implementation (the kernel is forward-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sq_ref):
    """grid (B, nb): accumulate per-channel sums over row blocks.

    outputs are [B, 1, C] so the (1, 1, C) block tiles (second-to-last
    block dim equals the full dim)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)  # [BR, C]
    sum_ref[0] += x.sum(axis=0, keepdims=True)
    sq_ref[0] += (x * x).sum(axis=0, keepdims=True)


def _norm_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, o_ref, *,
                 apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)  # [BR, C]
    y = (x - mean_ref[0]) * rstd_ref[0] * scale_ref[0] + bias_ref[0]
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_silu_ref(x2, scale, bias, groups, eps, apply_silu):
    """XLA reference on [B, N, C]."""
    b, n, c = x2.shape
    xf = x2.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, n, c)
    y = y * scale + bias
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x2.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pick_block_rows(n: int, c: int, itemsize: int, cap: int = 512) -> int:
    """Rows per block such that the in-block stays ≤ ~1 MB — with fp32
    temps and double buffering that keeps the kernel's scoped VMEM well
    under the 16 MB limit (512 rows × 1920 ch × f32 measured 22.5 MB and
    failed to compile on v5e; 136 rows fits)."""
    budget = 1024 * 1024
    br = max(8, min(cap, budget // max(c * itemsize, 1)))
    return min(_round_up(n, 8), (br // 8) * 8)


def _gn_silu_fwd_tpu(x2, scale, bias, groups, eps, apply_silu):
    b, n, c = x2.shape
    g = groups
    br = _pick_block_rows(n, c, x2.dtype.itemsize)
    npad = _round_up(n, br)
    xp = jnp.pad(x2, ((0, 0), (0, npad - n), (0, 0))) if npad != n else x2
    nb = npad // br

    sums3, sqs3 = pl.pallas_call(
        _stats_kernel,
        grid=(b, nb),
        in_specs=[pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)),
    )(xp)
    sums, sqs = sums3[:, 0], sqs3[:, 0]

    # tiny group math in XLA: [B, C] @ [C, G] → per-group stats → back to C
    ind = (jnp.arange(c)[:, None] // (c // g)
           == jnp.arange(g)[None, :]).astype(jnp.float32)
    denom = jnp.float32(n * (c // g))
    mean_g = (sums @ ind) / denom
    var_g = (sqs @ ind) / denom - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = (mean_g @ ind.T)[:, None]  # [B, 1, C]
    rstd_c = (rstd_g @ ind.T)[:, None]

    yp = pl.pallas_call(
        functools.partial(_norm_kernel, apply_silu=apply_silu),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), x2.dtype),
    )(xp, mean_c, rstd_c, scale[None, None].astype(jnp.float32),
      bias[None, None].astype(jnp.float32))
    return yp[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_silu(x2, scale, bias, groups, eps, apply_silu, use_pallas):
    if use_pallas:
        return _gn_silu_fwd_tpu(x2, scale, bias, groups, eps, apply_silu)
    return _gn_silu_ref(x2, scale, bias, groups, eps, apply_silu)


def _gn_fwd(x2, scale, bias, groups, eps, apply_silu, use_pallas):
    y = _gn_silu(x2, scale, bias, groups, eps, apply_silu, use_pallas)
    return y, (x2, scale, bias)


def _gn_bwd(groups, eps, apply_silu, use_pallas, res, g):
    x2, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b_: _gn_silu_ref(x, s, b_, groups, eps, apply_silu),
        x2, scale, bias)
    return vjp(g)


_gn_silu.defvjp(_gn_fwd, _gn_bwd)


def fused_group_norm_silu(
    x: jax.Array,  # [B, H, W, C] NHWC
    scale: jax.Array,
    bias: jax.Array,
    groups: int,
    eps: float,
    apply_silu: bool = True,
    use_pallas: bool | None = None,
) -> jax.Array:
    """GroupNorm (+ SiLU) with a single-pass Pallas kernel on TPU.

    Falls back to XLA when off-TPU or when the per-sample activation
    exceeds a safe VMEM budget.
    """
    b, h, w, c = x.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    x2 = x.reshape(b, h * w, c)
    y = _gn_silu(x2, scale, bias, groups, eps, apply_silu, use_pallas)
    return y.reshape(b, h, w, c)
