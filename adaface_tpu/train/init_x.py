"""Foreground-seeded x_start initialization for comp iterations.

Rebuild of `init_x_with_fg_from_training_image` (`ldm/util.py:1599-1672`):
keep the training latent inside the fg mask, fill the background with
noise, bilinearly shrink the fg into the canvas with a random offset
(scale chosen so large faces don't dominate), and blend a little noise
over the result. Reference-exact given the same (scale, dh, dw) plan and
noise draws; the three noise tensors are injectable for golden testing.

The random scale/offset are host-side decisions; the pixel work is
in-graph with static shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.resize import resize_bilinear_scale_factor


def plan_fg_init(
    fg_mask_percent: float,
    rng: np.random.RandomState,
    base_scale_range=(0.8, 1.0),
    hw: tuple[int, int] | None = None,
) -> tuple[float, int, int]:
    """Host-side scale/offset plan (`ldm/util.py:1604-1652`). With `hw`
    the pad-offset perturbation uses the reference's exact bounds
    (min(pad1-1, pad2-1, 4), high-exclusive); else a ±4 fallback."""
    lb, ub = base_scale_range
    if fg_mask_percent > 0.2:
        extra = math.pow(0.2 / fg_mask_percent, 0.35)
        lb2 = lb * extra
        ub2 = max(0.5, ub * extra)
        scale = rng.rand() * (ub2 - lb2) + lb2
    else:
        scale = rng.rand() * (ub - lb) + lb
    scale = float(min(scale, 1.0))
    if hw is not None:
        h, w = hw
        ns_h, ns_w = int(h * scale), int(w * scale)
        pad_h1, pad_w1 = (h - ns_h) // 2, (w - ns_w) // 2
        pad_h2, pad_w2 = h - ns_h - pad_h1, w - ns_w - pad_w1
        max_h = min(pad_h1 - 1, pad_h2 - 1, 4)
        max_w = min(pad_w1 - 1, pad_w2 - 1, 4)
        dh = int(rng.randint(-max_h, max_h)) if max_h > 0 else 0
        dw = int(rng.randint(-max_w, max_w)) if max_w > 0 else 0
    else:
        dh = int(rng.randint(-4, 5))
        dw = int(rng.randint(-4, 5))
    return scale, dh, dw


def init_x_with_fg_from_training_image(
    x_start: jax.Array,  # [B, 4, h, w]
    fg_mask: jax.Array,  # [B, 1, h, w]
    rng: jax.Array | None = None,
    scale: float = 0.9,
    dh: int = 0,
    dw: int = 0,
    fg_noise_amount: float = 0.2,
    bg_noise1: jax.Array | None = None,  # randn_like draw at `:1602`
    bg_noise2: jax.Array | None = None,  # randn_like draw at `:1666`
    blend_noise: jax.Array | None = None,  # randn_like draw at `:1670`
) -> tuple[jax.Array, jax.Array]:
    """→ (x_init, fg_mask_scaled), matching the reference write-for-write:

    1. bg of x_start filled with noise1;
    2. [x ‖ mask] bilinearly scaled (align_corners=False) and zero-padded
       back to the canvas with the (dh, dw)-perturbed centering;
    3. outside the scaled mask filled with noise2;
    4. the WHOLE tensor blended with noise3 (the reference comment says
       "fg area" but the code blends everywhere, `ldm/util.py:1670`).
    """
    b, c, h, w = x_start.shape
    if rng is not None:
        k1, k2, k3 = jax.random.split(rng, 3)
        if bg_noise1 is None:
            bg_noise1 = jax.random.normal(k1, x_start.shape, x_start.dtype)
        if bg_noise2 is None:
            bg_noise2 = jax.random.normal(k2, x_start.shape, x_start.dtype)
        if blend_noise is None:
            blend_noise = jax.random.normal(k3, x_start.shape, x_start.dtype)
    x_maskfilled = jnp.where(fg_mask > 0, x_start, bg_noise1)

    xm = jnp.concatenate([x_maskfilled, fg_mask.astype(x_start.dtype)],
                         axis=1)
    # torch F.interpolate(scale_factor=…) samples with the GIVEN scale,
    # not the out/in ratio — mirrored by resize_bilinear_scale_factor
    small = resize_bilinear_scale_factor(xm, scale)
    ns_h, ns_w = small.shape[-2], small.shape[-1]

    pad_h1 = (h - ns_h) // 2 + dh
    pad_w1 = (w - ns_w) // 2 + dw
    pad_h1 = min(max(pad_h1, 0), h - ns_h)
    pad_w1 = min(max(pad_w1, 0), w - ns_w)
    canvas = jnp.zeros((b, c + 1, h, w), x_start.dtype)
    canvas = jax.lax.dynamic_update_slice(
        canvas, small, (0, 0, pad_h1, pad_w1))
    x_scaled = canvas[:, :c]
    fg_scaled = canvas[:, c:]

    x_init = jnp.where(fg_scaled > 0, x_scaled, bg_noise2)
    x_init = blend_noise * fg_noise_amount + x_init * (1 - fg_noise_amount)
    return x_init, fg_scaled
