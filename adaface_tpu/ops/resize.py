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
