"""Fast nearest-neighbor spatial resizing.

`jax.image.resize(method='nearest')` lowers to a general gather that is
~25x slower than a reshape-broadcast on TPU (measured 401ms vs 17ms for a
256→512 upsample of a [1,256,256,128] bf16 tensor on v5e). These helpers
implement the two cases the framework needs:

- upsample2x_nearest: broadcast-reshape (UNet/VAE upsamplers)
- resize_nearest:     integer-index `take` along H and W (mask pyramids)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B, 2H, 2W, C] (NHWC)."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


def resize_bilinear_align_corners(
    x: jax.Array, out_hw: tuple[int, int],
    spatial_axes: tuple[int, int] = (1, 2)) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics
    (src = dst·(in−1)/(out−1)), as two separable 1-D gathers. Used by the
    BiSeNet output heads (`face_parsing/model.py:251-253`); jax.image
    has no align-corners mode."""
    out_h, out_w = out_hw

    def interp_axis(x, axis, out_n):
        in_n = x.shape[axis]
        if in_n == out_n:
            return x
        src = (jnp.arange(out_n, dtype=jnp.float32)
               * (max(in_n - 1, 1) / max(out_n - 1, 1)))
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        w = src - lo
        shape = [1] * x.ndim
        shape[axis] = out_n
        w = w.reshape(shape).astype(x.dtype)
        return (jnp.take(x, lo, axis=axis) * (1 - w)
                + jnp.take(x, hi, axis=axis) * w)

    x = interp_axis(x, spatial_axes[0], out_h)
    return interp_axis(x, spatial_axes[1], out_w)


def resize_bilinear_half_pixel(
    x: jax.Array, out_hw: tuple[int, int],
    spatial_axes: tuple[int, int] = (1, 2)) -> jax.Array:
    """Bilinear resize with torch `F.interpolate(align_corners=False)`
    semantics: src = (dst+0.5)·in/out − 0.5, clamped, NO antialiasing —
    jax.image.resize antialiases on downsample, which torch does not."""
    out_h, out_w = out_hw

    def interp_axis(x, axis, out_n):
        in_n = x.shape[axis]
        if in_n == out_n:
            return x
        src = ((jnp.arange(out_n, dtype=jnp.float32) + 0.5)
               * (in_n / out_n) - 0.5)
        src = jnp.clip(src, 0.0, in_n - 1.0)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        w = src - lo
        shape = [1] * x.ndim
        shape[axis] = out_n
        w = w.reshape(shape).astype(x.dtype)
        return (jnp.take(x, lo, axis=axis) * (1 - w)
                + jnp.take(x, hi, axis=axis) * w)

    x = interp_axis(x, spatial_axes[0], out_h)
    return interp_axis(x, spatial_axes[1], out_w)


def resize_bilinear_scale_factor(
    x: jax.Array, scale: float,
    spatial_axes: tuple[int, int] = (-2, -1)) -> jax.Array:
    """torch `F.interpolate(scale_factor=s, mode='bilinear',
    align_corners=False)` semantics: out_n = floor(in_n·s) and the source
    coordinate uses the GIVEN scale factor, src = (dst+0.5)/s − 0.5 — not
    the out/in ratio (torch only recomputes the ratio when
    recompute_scale_factor=True)."""

    def interp_axis(x, axis, s):
        in_n = x.shape[axis]
        out_n = int(in_n * s)
        if in_n == out_n:
            return x
        src = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) / s - 0.5
        src = jnp.clip(src, 0.0, in_n - 1.0)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        w = src - lo
        shape = [1] * x.ndim
        shape[axis] = out_n
        w = w.reshape(shape).astype(x.dtype)
        return (jnp.take(x, lo, axis=axis) * (1 - w)
                + jnp.take(x, hi, axis=axis) * w)

    x = interp_axis(x, spatial_axes[0], scale)
    return interp_axis(x, spatial_axes[1], scale)


def resize_nearest(x: jax.Array, out_hw: tuple[int, int],
                   spatial_axes: tuple[int, int] = (-2, -1)) -> jax.Array:
    """Nearest resize along two axes via take (torch/PIL 'nearest'
    convention: src_idx = floor(dst_idx * scale))."""
    ah, aw = spatial_axes
    in_h = x.shape[ah]
    in_w = x.shape[aw]
    out_h, out_w = out_hw
    if (in_h, in_w) == (out_h, out_w):
        return x
    idx_h = (jnp.arange(out_h) * in_h // out_h).astype(jnp.int32)
    idx_w = (jnp.arange(out_w) * in_w // out_w).astype(jnp.int32)
    x = jnp.take(x, idx_h, axis=ah)
    x = jnp.take(x, idx_w, axis=aw)
    return x
