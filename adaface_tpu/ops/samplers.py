"""Samplers as compiled `lax.scan` loops.

TPU-native rebuild of the reference's two sampling paths:
- the legacy LDM `DDIMSampler` (`ldm/models/diffusion/ddim.py`) with uniform
  spacing and per-step linearly interpolated dual guidance scale, and
- the diffusers `DDIMScheduler` semantics used by AdaFaceWrapper
  (`adaface/adaface_wrapper.py:234-277`: leading spacing,
  set_alpha_to_one=False, steps_offset=1).

The whole denoising loop is one jitted `lax.scan` over a precomputed
timestep/alpha table, so the 25–50 UNet forwards compile to a single XLA
program with no host round-trips. CFG is done by batching the conditional and
unconditional contexts along the batch axis (one UNet call per step).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.schedules import DiffusionSchedule, ddim_timesteps

# model_fn(x, t, ctx) -> eps prediction; x [B,C,H,W], t [B] int32, ctx pytree
ModelFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_inference_steps: int = 50
    eta: float = 0.0
    # Dual guidance scale: linearly interpolated from guidance_scale (step 0)
    # to guidance_scale_min (last step), matching the reference's
    # `stable_txt2img.py` dual-scale eval protocol (4 -> 1).
    guidance_scale: float = 6.0
    guidance_scale_min: float | None = None
    spacing: str = "leading"
    steps_offset: int = 1
    set_alpha_to_one: bool = False


def _alpha_tables(schedule: DiffusionSchedule, cfg: DDIMConfig):
    ts = ddim_timesteps(
        schedule.num_timesteps,
        cfg.num_inference_steps,
        steps_offset=cfg.steps_offset,
        spacing=cfg.spacing,
    )
    ac = np.asarray(schedule.alphas_cumprod)
    alpha_t = ac[ts]
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(ac[0])
    prev_ts = ts - schedule.num_timesteps // cfg.num_inference_steps
    alpha_prev = np.where(prev_ts >= 0, ac[np.clip(prev_ts, 0, None)], final_alpha)
    return (
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(alpha_t, jnp.float32),
        jnp.asarray(alpha_prev, jnp.float32),
    )


def guidance_scales(cfg: DDIMConfig) -> jax.Array:
    n = cfg.num_inference_steps
    hi = cfg.guidance_scale
    lo = cfg.guidance_scale_min if cfg.guidance_scale_min is not None else hi
    return jnp.linspace(hi, lo, n, dtype=jnp.float32)


def ddim_step(
    x: jax.Array,
    eps: jax.Array,
    alpha_t: jax.Array,
    alpha_prev: jax.Array,
    eta: float,
    noise: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One DDIM update x_t -> x_{t_prev}. Returns (x_prev, pred_x0)."""
    alpha_t = alpha_t.astype(jnp.float32)
    x = x.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    pred_x0 = (x - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
    sigma = eta * jnp.sqrt(
        (1 - alpha_prev) / (1 - alpha_t) * (1 - alpha_t / alpha_prev)
    )
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - alpha_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(alpha_prev) * pred_x0 + dir_xt
    if eta > 0 and noise is not None:
        x_prev = x_prev + sigma * noise
    return x_prev, pred_x0


def ddim_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_T: jax.Array,
    cond_ctx,
    uncond_ctx=None,
    cfg: DDIMConfig = DDIMConfig(),
    rng: jax.Array | None = None,
) -> jax.Array:
    """Full DDIM sampling loop as lax.scan.

    cond_ctx / uncond_ctx are arbitrary pytrees passed to model_fn (e.g.
    {'text_embs': [B,77,768], 'kv_mask': ...}). With uncond_ctx given, CFG
    batches [uncond; cond] in one model call per step.
    """
    ts, alpha_t, alpha_prev = _alpha_tables(schedule, cfg)
    scales = guidance_scales(cfg)
    b = x_T.shape[0]
    use_cfg = uncond_ctx is not None

    if use_cfg:
        both_ctx = jax.tree_util.tree_map(
            lambda u, c: jnp.concatenate([u, c], axis=0), uncond_ctx, cond_ctx
        )
    else:
        both_ctx = cond_ctx

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, inp):
        x, key = carry
        t, a_t, a_prev, scale = inp
        tb = jnp.full((b,), t, jnp.int32)
        if use_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([tb, tb], axis=0)
            eps2 = model_fn(x2, t2, both_ctx)
            eps_u, eps_c = jnp.split(eps2.astype(jnp.float32), 2, axis=0)
            eps = eps_u + scale * (eps_c - eps_u)
        else:
            eps = model_fn(x, tb, both_ctx).astype(jnp.float32)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32) if cfg.eta > 0 else None
        x_prev, _ = ddim_step(x, eps, a_t, a_prev, cfg.eta, noise)
        return (x_prev.astype(x_T.dtype), key), None

    (x0, _), _ = jax.lax.scan(step, (x_T, rng), (ts, alpha_t, alpha_prev, scales))
    return x0


def multistep_denoise(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_start: jax.Array,
    noises: jax.Array,  # [S, B, C, H, W]
    timesteps: jax.Array,  # [S, B] int32, descending per batch element
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Training-time multi-step denoising (teacher/student loop).

    Mirrors `UNetTeacher.forward` (`adaface/unet_teachers.py:64-187`) /
    `recon_multistep_denoise` (`ddpm.py:1753`) step structure: at step s the
    current x_start estimate is re-noised at timesteps[s] and denoised; the
    eps prediction rolls the x_start estimate forward. Returns stacked
    (noise_preds [S,...], x_starts [S,...], x_ts [S,...]).
    """

    def step(x0, inp):
        noise, t = inp
        x_t = schedule.q_sample(x0, t, noise)
        eps = model_fn(x_t, t, None)
        x0_next = schedule.predict_start_from_noise(x_t, t, eps)
        return x0_next, (eps, x0_next, x_t)

    _, (noise_preds, x_starts, x_ts) = jax.lax.scan(
        step, x_start, (noises, timesteps)
    )
    return noise_preds, x_starts, x_ts
