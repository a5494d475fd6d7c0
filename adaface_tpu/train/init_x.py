"""Foreground-seeded x_start initialization for comp iterations.

Rebuild of `init_x_with_fg_from_training_image` (`ldm/util.py:1599-1677`):
keep the training latent inside the fg mask, fill the background with
noise, randomly shrink the fg into the canvas with a random offset (scale
chosen so large faces don't dominate), and add a little noise to the fg.

The random scale/offset are host-side decisions; the pixel work is
in-graph with static shapes (fixed canvas, dynamic_update via the fast
resize + pad composition).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.resize import resize_nearest


def plan_fg_init(
    fg_mask_percent: float,
    rng: np.random.RandomState,
    base_scale_range=(0.8, 1.0),
) -> tuple[float, int, int]:
    """Host-side scale/offset plan (`:1604-1646`)."""
    lb, ub = base_scale_range
    if fg_mask_percent > 0.2:
        extra = math.pow(0.2 / fg_mask_percent, 0.35)
        lb2 = lb * extra
        ub2 = max(0.5, ub * extra)
        scale = rng.rand() * (ub2 - lb2) + lb2
    else:
        scale = rng.rand() * (ub - lb) + lb
    dw = int(rng.randint(-4, 5))
    dh = int(rng.randint(-4, 5))
    return float(min(scale, 1.0)), dh, dw


def init_x_with_fg_from_training_image(
    x_start: jax.Array,  # [B, 4, h, w]
    fg_mask: jax.Array,  # [B, 1, h, w]
    rng: jax.Array,
    scale: float = 0.9,
    dh: int = 0,
    dw: int = 0,
    fg_noise_amount: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """→ (x_init, fg_mask_scaled)."""
    b, c, h, w = x_start.shape
    k1, k2 = jax.random.split(rng)
    x_maskfilled = jnp.where(fg_mask > 0, x_start,
                             jax.random.normal(k1, x_start.shape,
                                               x_start.dtype))
    ns_h = max(int(h * scale), 8)
    ns_w = max(int(w * scale), 8)
    xm = jnp.concatenate([x_maskfilled, fg_mask.astype(x_start.dtype)], axis=1)
    small = resize_nearest(xm, (ns_h, ns_w))
    pad_h1 = max((h - ns_h) // 2 + dh, 0)
    pad_w1 = max((w - ns_w) // 2 + dw, 0)
    pad_h1 = min(pad_h1, h - ns_h)
    pad_w1 = min(pad_w1, w - ns_w)
    canvas = jax.random.normal(k2, (b, c + 1, h, w), x_start.dtype)
    canvas = canvas.at[:, c:].set(0.0)  # mask channel starts empty
    canvas = jax.lax.dynamic_update_slice(
        canvas, small, (0, 0, pad_h1, pad_w1))
    x_init = canvas[:, :c]
    fg_scaled = canvas[:, c:]
    # perturb the fg content a little (`fg_noise_amount`)
    noise = jax.random.normal(k1, x_init.shape, x_init.dtype)
    x_init = jnp.where(fg_scaled > 0,
                       x_init * (1 - fg_noise_amount)
                       + noise * fg_noise_amount,
                       x_init)
    return x_init, fg_scaled
