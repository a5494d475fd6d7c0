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
    deepcache: tuple | None = None,
) -> jax.Array:
    """Full DDIM sampling loop as lax.scan.

    cond_ctx / uncond_ctx are arbitrary pytrees passed to model_fn (e.g.
    {'text_embs': [B,77,768], 'kv_mask': ...}). With uncond_ctx given, CFG
    batches [uncond; cond] in one model call per step.

    deepcache = (interval, model_full_fn, model_shallow_fn, init_cache)
    enables encoder caching: every `interval`-th step runs
    `model_full_fn(x, t, ctx) -> (eps, cache)` (the whole UNet, also
    emitting the deep-trunk feature), other steps run
    `model_shallow_fn(x, t, ctx, cache) -> eps` (shallowest blocks only).
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

    dc = deepcache is not None and deepcache[0] > 1

    def step(carry, inp):
        if dc:
            x, key, cache, i = carry
        else:
            x, key = carry
        t, a_t, a_prev, scale = inp
        tb = jnp.full((b,), t, jnp.int32)
        if use_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([tb, tb], axis=0)
        else:
            x2, t2 = x, tb
        if dc:
            interval, full_fn, shallow_fn, _ = deepcache
            eps2, cache = jax.lax.cond(
                i % interval == 0,
                lambda xx, tt, c: full_fn(xx, tt, both_ctx),
                lambda xx, tt, c: (shallow_fn(xx, tt, both_ctx, c), c),
                x2, t2, cache,
            )
        else:
            eps2 = model_fn(x2, t2, both_ctx)
        if use_cfg:
            eps_u, eps_c = jnp.split(eps2.astype(jnp.float32), 2, axis=0)
            eps = eps_u + scale * (eps_c - eps_u)
        else:
            eps = eps2.astype(jnp.float32)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32) if cfg.eta > 0 else None
        x_prev, _ = ddim_step(x, eps, a_t, a_prev, cfg.eta, noise)
        if dc:
            return (x_prev.astype(x_T.dtype), key, cache, i + 1), None
        return (x_prev.astype(x_T.dtype), key), None

    if dc:
        init = (x_T, rng, deepcache[3], jnp.int32(0))
    else:
        init = (x_T, rng)
    out, _ = jax.lax.scan(step, init, (ts, alpha_t, alpha_prev, scales))
    return out[0]


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


# ---------------------------------------------------------------------------
# Additional schedulers installed by AdaFaceWrapper
# (`adaface_wrapper.py:234-277`: DDIM / PNDM / DPM++ / LCM)
# ---------------------------------------------------------------------------


def dpm_solver_pp_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_T: jax.Array,
    cond_ctx,
    uncond_ctx=None,
    num_inference_steps: int = 25,
    guidance_scale: float = 6.0,
) -> jax.Array:
    """DPM-Solver++(2M) multistep (the diffusers `DPMSolverMultistep`
    scheduler the wrapper can install). Data-prediction form with
    log-SNR interpolation; second-order from step 2 onward."""
    ts = ddim_timesteps(schedule.num_timesteps, num_inference_steps)
    ac = np.asarray(schedule.alphas_cumprod)
    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    lam = np.log(alpha / sigma)
    # append the final (t=0) point: alpha 1, sigma ~0
    alpha = np.append(alpha, 1.0)
    sigma = np.append(sigma, 1e-3)
    lam = np.append(lam, np.log(alpha[-1] / sigma[-1]))

    use_cfg = uncond_ctx is not None
    if use_cfg:
        ctx = jax.tree_util.tree_map(
            lambda u, c: jnp.concatenate([u, c], 0), uncond_ctx, cond_ctx)
    else:
        ctx = cond_ctx
    b = x_T.shape[0]

    def eps_pred(x, t_scalar):
        tb = jnp.full((b,), t_scalar, jnp.int32)
        if use_cfg:
            e2 = model_fn(jnp.concatenate([x, x], 0),
                          jnp.concatenate([tb, tb], 0), ctx)
            eu, ec = jnp.split(e2.astype(jnp.float32), 2, 0)
            return eu + guidance_scale * (ec - eu)
        return model_fn(x, tb, ctx).astype(jnp.float32)

    x = x_T.astype(jnp.float32)
    d_prev = None
    for i in range(num_inference_steps):
        eps = eps_pred(x.astype(x_T.dtype), int(ts[i]))
        # data prediction x0
        d_cur = (x - sigma[i] * eps) / alpha[i]
        h = lam[i + 1] - lam[i]
        if d_prev is None:
            d = d_cur
        else:
            h_prev = lam[i] - lam[i - 1]
            r = h_prev / h
            d = (1 + 1 / (2 * r)) * d_cur - (1 / (2 * r)) * d_prev
        x = (sigma[i + 1] / sigma[i]) * x \
            - alpha[i + 1] * float(np.expm1(-h)) * d
        d_prev = d_cur
    return x.astype(x_T.dtype)


def pndm_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_T: jax.Array,
    cond_ctx,
    uncond_ctx=None,
    num_inference_steps: int = 50,
    guidance_scale: float = 6.0,
) -> jax.Array:
    """PNDM (pseudo linear multistep): 4th-order Adams–Bashforth on the
    eps history after a DDIM-stepped warmup (skipping the Runge-Kutta
    prk phase as diffusers does with `skip_prk_steps=True` for SD)."""
    ts = ddim_timesteps(schedule.num_timesteps, num_inference_steps)
    ac = schedule.alphas_cumprod
    step_gap = schedule.num_timesteps // num_inference_steps

    use_cfg = uncond_ctx is not None
    if use_cfg:
        ctx = jax.tree_util.tree_map(
            lambda u, c: jnp.concatenate([u, c], 0), uncond_ctx, cond_ctx)
    else:
        ctx = cond_ctx
    b = x_T.shape[0]

    def eps_pred(x, t_scalar):
        tb = jnp.full((b,), t_scalar, jnp.int32)
        if use_cfg:
            e2 = model_fn(jnp.concatenate([x, x], 0),
                          jnp.concatenate([tb, tb], 0), ctx)
            eu, ec = jnp.split(e2.astype(jnp.float32), 2, 0)
            return eu + guidance_scale * (ec - eu)
        return model_fn(x, tb, ctx).astype(jnp.float32)

    def transfer(x, t, t_prev, eps):
        a_t = ac[jnp.maximum(t, 0)]
        a_p = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_p) * x0 + jnp.sqrt(1 - a_p) * eps

    x = x_T.astype(jnp.float32)
    history = []
    for i in range(num_inference_steps):
        t = int(ts[i])
        t_prev = t - step_gap
        eps = eps_pred(x.astype(x_T.dtype), t)
        history.append(eps)
        if len(history) == 1:
            eps_used = eps
        elif len(history) == 2:
            eps_used = (3 * history[-1] - history[-2]) / 2
        elif len(history) == 3:
            eps_used = (23 * history[-1] - 16 * history[-2]
                        + 5 * history[-3]) / 12
        else:
            eps_used = (55 * history[-1] - 59 * history[-2]
                        + 37 * history[-3] - 9 * history[-4]) / 24
            history.pop(0)
        x = transfer(x, t, t_prev, eps_used)
    return x.astype(x_T.dtype)


def lcm_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_T: jax.Array,
    cond_ctx,
    num_inference_steps: int = 4,
    rng: jax.Array | None = None,
    original_inference_steps: int = 50,
) -> jax.Array:
    """LCM few-step sampler (`LCMScheduler`; the wrapper's 4-step path,
    `adaface_wrapper.py:262-271`): consistency x0 prediction with the
    boundary-condition skip/out scalings, re-noising between steps.
    No CFG (LCM distils guidance into the model)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k = schedule.num_timesteps // original_inference_steps
    lcm_origin = (np.arange(1, original_inference_steps + 1) * k - 1)
    idx = np.linspace(0, len(lcm_origin) - 1, num_inference_steps)
    ts = lcm_origin[::-1][idx.astype(int)]
    ac = schedule.alphas_cumprod
    b = x_T.shape[0]
    sigma_data = 0.5

    x = x_T.astype(jnp.float32)
    for i, t in enumerate(ts):
        tb = jnp.full((b,), int(t), jnp.int32)
        eps = model_fn(x.astype(x_T.dtype), tb, cond_ctx).astype(jnp.float32)
        a_t = ac[int(t)]
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        # boundary-condition scalings
        t_scaled = float(t) / 10.0  # timestep_scaling 10 / 0.1 convention
        c_skip = sigma_data**2 / ((t_scaled / 10) ** 2 + sigma_data**2)
        c_out = (t_scaled / 10) / np.sqrt((t_scaled / 10) ** 2 + sigma_data**2)
        denoised = c_skip * x + c_out * x0
        if i < len(ts) - 1:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
            a_next = ac[int(ts[i + 1])]
            x = jnp.sqrt(a_next) * denoised + jnp.sqrt(1 - a_next) * noise
        else:
            x = denoised
    return x.astype(x_T.dtype)


def euler_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_T: jax.Array,
    cond_ctx,
    uncond_ctx=None,
    cfg: DDIMConfig = DDIMConfig(),
) -> jax.Array:
    """Euler discrete sampler (`EulerDiscreteScheduler` semantics, the SDXL
    pipeline's default which the reference keeps for `text2imgxl`:
    `adaface_wrapper.py:234` skips the DDIM swap for SDXL/SD3/Flux).

    ε-prediction: sigma_i = sqrt((1-ᾱ)/ᾱ); x_{i+1} = x_i + ε·(σ_{i+1}-σ_i),
    with model inputs scaled by 1/sqrt(σ²+1) and x_T pre-scaled by
    `init_noise_sigma = sqrt(σ_max²+1)` (leading spacing). Dual-scale CFG
    interpolation follows `guidance_scales`.
    """
    ts = ddim_timesteps(
        schedule.num_timesteps, cfg.num_inference_steps,
        steps_offset=cfg.steps_offset, spacing=cfg.spacing,
    )
    ac = np.asarray(schedule.alphas_cumprod)
    sigmas = np.sqrt((1.0 - ac[ts]) / ac[ts])  # descending with the loop
    sigma_next = np.append(sigmas[1:], 0.0)
    scales = guidance_scales(cfg)
    b = x_T.shape[0]
    use_cfg = uncond_ctx is not None
    if use_cfg:
        both_ctx = jax.tree_util.tree_map(
            lambda u, c: jnp.concatenate([u, c], axis=0), uncond_ctx, cond_ctx
        )
    else:
        both_ctx = cond_ctx

    x0 = x_T.astype(jnp.float32) * jnp.sqrt(jnp.float32(sigmas[0]) ** 2 + 1.0)

    def step(x, inp):
        t, sig, sig_next, scale = inp
        x_in = (x / jnp.sqrt(sig**2 + 1.0)).astype(x_T.dtype)
        tb = jnp.full((b,), t, jnp.int32)
        if use_cfg:
            eps2 = model_fn(jnp.concatenate([x_in, x_in], axis=0),
                            jnp.concatenate([tb, tb], axis=0), both_ctx)
            eps_u, eps_c = jnp.split(eps2.astype(jnp.float32), 2, axis=0)
            eps = eps_u + scale * (eps_c - eps_u)
        else:
            eps = model_fn(x_in, tb, both_ctx).astype(jnp.float32)
        return x + eps * (sig_next - sig), None

    out, _ = jax.lax.scan(
        step, x0,
        (jnp.asarray(ts, jnp.int32), jnp.asarray(sigmas, jnp.float32),
         jnp.asarray(sigma_next, jnp.float32), scales))
    return out.astype(x_T.dtype)


def rectified_flow_sample(
    model_fn: ModelFn,
    x_T: jax.Array,
    cond_ctx,
    uncond_ctx=None,
    num_inference_steps: int = 28,
    guidance_scale: float = 7.0,
    shift: float = 3.0,
) -> jax.Array:
    """Flow-matching Euler sampler (`FlowMatchEulerDiscreteScheduler`
    semantics, the SD3 pipeline default used by the reference's
    "text2img3" branch).

    The model predicts velocity v on x_σ = (1−σ)·x₀ + σ·ε; the timestep
    fed to the model is σ·1000 with the resolution shift
    σ = s·u/(1+(s−1)·u). The grid matches diffusers' scheduler exactly:
    the train-grid endpoints [1, 1/1000] are shift-transformed once at
    construction, the inference grid linspaces between those shifted
    endpoints, and `set_timesteps` applies the shift transform AGAIN —
    so σ_min ≈ 0.009 at shift 3 (NOT 1/num_inference_steps; a 1/n lower
    bound would leave the final model evaluation at σ≈0.1 and diverge
    from the reference trajectory over the last steps).
    One Euler step: x ← x + v·(σ_next − σ).
    """
    n = num_inference_steps
    n_train = 1000
    # first shift application (scheduler __init__): endpoints 1 → 1,
    # 1/1000 → shifted sigma_min
    sig_min_t = (shift * (1.0 / n_train)
                 / (1.0 + (shift - 1.0) * (1.0 / n_train)))
    u = np.linspace(1.0, sig_min_t, n)
    # second shift application (set_timesteps)
    sigmas = shift * u / (1.0 + (shift - 1.0) * u)
    sigma_next = np.append(sigmas[1:], 0.0)
    b = x_T.shape[0]
    use_cfg = uncond_ctx is not None
    if use_cfg:
        both_ctx = jax.tree_util.tree_map(
            lambda un, c: jnp.concatenate([un, c], axis=0),
            uncond_ctx, cond_ctx)
    else:
        both_ctx = cond_ctx

    def step(x, inp):
        sig, sig_next = inp
        tb = jnp.full((b,), sig * 1000.0, jnp.float32)
        if use_cfg:
            v2 = model_fn(jnp.concatenate([x, x], axis=0).astype(x_T.dtype),
                          jnp.concatenate([tb, tb], axis=0), both_ctx)
            v_u, v_c = jnp.split(v2.astype(jnp.float32), 2, axis=0)
            v = v_u + guidance_scale * (v_c - v_u)
        else:
            v = model_fn(x.astype(x_T.dtype), tb, both_ctx).astype(jnp.float32)
        return x + v * (sig_next - sig), None

    out, _ = jax.lax.scan(
        step, x_T.astype(jnp.float32),
        (jnp.asarray(sigmas, jnp.float32),
         jnp.asarray(sigma_next, jnp.float32)))
    return out.astype(x_T.dtype)
