"""Multi-step recon denoising with the ArcFace adversarial attack.

Rebuilds of the advanced normal-recon machinery:
- `recon_multistep_denoise` (`ddpm.py:1753-1917`): priming no-grad steps
  followed by gradient-carrying denoise steps, with an optional
  adversarial ArcFace gradient added to the noise so recon robustifies
  identity (`calc_arcface_adv_grad`, `ddpm.py:2536-2581` — the reference's
  deliberate fault-injection-like mechanism, SURVEY §5).
- `redenoise_subj_single` (`ddpm.py:2093-2271`): re-denoise the
  subject-single instance from an SC-crop-mixed start, quality-gated by
  the Laplacian variance of the decoded image (`var_of_laplacian`,
  `ldm/util.py:786-801`).
- smooth_grad (`SmoothGrad`, `ldm/util.py:827-870`): identity forward,
  3×3-smoothed cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.vae import vae_decode
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.train.face_losses import embed_face_crops

# numpy (NOT jnp): this module may be first imported inside a jit
# trace (comp_step lazily imports comp_face_align in its traced loss
# fn), and a module-level jnp array created under a trace leaks that
# trace's tracer into every later graph (UnexpectedTracerError on the
# chip, 2026-08-21)
RGB_TO_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)

SMOOTH_KERNELS = {
    1: jnp.ones((3, 3)) / 9.0,
    2: jnp.asarray([[1, 1, 1], [1, 2, 1], [1, 1, 1]], jnp.float32) / 10.0,
    3: jnp.asarray([[1, 1, 1], [1, 3, 1], [1, 1, 1]], jnp.float32) / 11.0,
    4: jnp.asarray([[1, 1, 1], [1, 4, 1], [1, 1, 1]], jnp.float32) / 12.0,
}


def smooth_tensor(x: jax.Array, kernel_center_weight: int = 2) -> jax.Array:
    """Depthwise 3×3 smoothing of [B, C, H, W] (`smooth_tensor_34d`)."""
    b, c, h, w = x.shape
    k = SMOOTH_KERNELS[kernel_center_weight].reshape(3, 3, 1, 1)
    y = jax.lax.conv_general_dilated(
        x.reshape(b * c, h, w, 1).astype(jnp.float32), k, (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, c, h, w).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def smooth_grad(x, kernel_center_weight: int = 2):
    """Identity forward; cotangent smoothed with the 3×3 kernel."""
    return x


def _sg_fwd(x, k):
    return x, None


def _sg_bwd(k, _, g):
    return (smooth_tensor(g, k),)


smooth_grad.defvjp(_sg_fwd, _sg_bwd)


def var_of_laplacian(images: jax.Array, scale: float = 10.0) -> jax.Array:
    """Per-image Laplacian variance (sharpness proxy) of [B, 3, H, W]."""
    gray = (images * RGB_TO_GRAY[None, :, None, None]).sum(1, keepdims=True)
    k = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]],
                    jnp.float32).reshape(3, 3, 1, 1)
    b, _, h, w = gray.shape
    lap = jax.lax.conv_general_dilated(
        (gray * scale).transpose(0, 2, 3, 1).astype(jnp.float32), k, (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # ddof=1: torch .var() is unbiased; the redenoise quality gate compares
    # against thresholds calibrated on that convention
    return lap.reshape(b, -1).var(axis=1, ddof=1)


def calc_arcface_adv_grad(
    arcface_params,
    vae_params,
    x_start: jax.Array,  # [B, 4, h, w] latents
    face_bboxes: jax.Array,  # [B, 4] latent-space face boxes
    pixel_bboxes: jax.Array,  # [B, 4] pixel-space boxes for the crop
    rng: jax.Array,
    dropout_p: float = 0.3,
    vae_cfg=None,
) -> jax.Array:
    """∂/∂x_start of the (dropped-out) squared face embedding of the
    decoded image, masked to the face box (`calc_arcface_adv_grad`)."""

    from adaface_tpu.models.vae import SD_VAE

    vae_cfg = vae_cfg or SD_VAE

    def self_align_loss(x):
        # remat the decode: jax.grad of this fn otherwise stores the full
        # decoder activation stack (OOMs a v5e at 512² bs4)
        img = jax.checkpoint(
            lambda p, z: vae_decode(p, z, vae_cfg))(vae_params, x)
        emb, _ = embed_face_crops(arcface_params, img, pixel_bboxes,
                                  (0.9, 0.9))
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, emb.shape)
        emb = jnp.where(keep, emb / (1.0 - dropout_p), 0.0)
        return (emb ** 2).mean()

    adv_grad = jax.grad(self_align_loss)(x_start)
    # mask to the face area in latent coords
    b, _, h, w = x_start.shape
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    x0, y0, x1, y1 = [face_bboxes[:, i, None, None] for i in range(4)]
    mask = ((xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1))
    return adv_grad * mask[:, None].astype(adv_grad.dtype)


def recon_multistep_denoise(
    model_fn,  # (x_t, t, grad: bool) -> eps
    schedule: DiffusionSchedule,
    x_start: jax.Array,
    t0: jax.Array,  # [B]
    rng: jax.Array,
    num_priming_steps: int = 1,
    num_recon_steps: int = 2,
    adv_grad: jax.Array | None = None,
    adv_grad_scale: float = 0.0,
):
    """→ (noise_preds [S,B,…], noises [S,B,…], x_ts [S,B,…], ts [S,B]) for
    the gradient-carrying steps. Priming steps roll x_start forward without
    gradients; the adversarial gradient perturbs x_start before the recon
    steps (`ddpm.py:1855-1912`)."""
    x0 = x_start
    t = t0
    key = rng
    for _ in range(num_priming_steps):
        key, k1 = jax.random.split(key)
        noise = jax.random.normal(k1, x0.shape, x0.dtype)
        x_t = schedule.q_sample(x0, t, noise)
        eps = jax.lax.stop_gradient(model_fn(x_t, t, False))
        x0 = jax.lax.stop_gradient(
            schedule.predict_start_from_noise(x_t, t, eps))
        t = (t.astype(jnp.float32) * 0.6).astype(jnp.int32)

    if adv_grad is not None and adv_grad_scale > 0:
        x0 = x0 + adv_grad_scale * jax.lax.stop_gradient(adv_grad)

    preds, noises, x_ts, ts = [], [], [], []
    for _ in range(num_recon_steps):
        key, k1 = jax.random.split(key)
        noise = jax.random.normal(k1, x0.shape, x0.dtype)
        x_t = schedule.q_sample(x0, t, noise)
        eps = model_fn(x_t, t, True)
        preds.append(eps)
        noises.append(noise)
        x_ts.append(x_t)
        ts.append(t)
        x0 = schedule.predict_start_from_noise(x_t, t, eps)
        t = (t.astype(jnp.float32) * 0.6).astype(jnp.int32)
    return (jnp.stack(preds), jnp.stack(noises), jnp.stack(x_ts),
            jnp.stack(ts))


def redenoise_subj_single(
    model_fn,
    schedule: DiffusionSchedule,
    vae_params,
    ss_x_start: jax.Array,  # [B, 4, h, w] subject-single denoised start
    sc_x_start: jax.Array,  # [B, 4, h, w] subject-comp
    sc_face_bboxes: jax.Array,  # [B, 4] latent coords
    rng: jax.Array,
    t_frac: float = 0.4,
    mix_ratio: float = 0.5,
    lap_var_thres: float = 0.2,
    vae_cfg=None,
):
    """Re-denoise SS from an SC-face-crop-mixed start, gated by the decoded
    image's Laplacian variance (`redenoise_subj_single:2093-2271`).

    Returns (x0_redenoised, quality_weight [B]) — quality_weight is 0 for
    blurry (low-variance) instances so downstream losses skip them without
    data-dependent control flow."""
    from adaface_tpu.train.face_losses import bilinear_crop

    b, _, h, w = ss_x_start.shape
    sc_face = bilinear_crop(sc_x_start, sc_face_bboxes, h)
    mixed = ss_x_start * (1 - mix_ratio) + sc_face * mix_ratio

    k1, k2 = jax.random.split(rng)
    t = jnp.full((b,), int(schedule.num_timesteps * t_frac), jnp.int32)
    noise = jax.random.normal(k1, mixed.shape, mixed.dtype)
    x_t = schedule.q_sample(mixed, t, noise)
    eps = model_fn(x_t, t, True)
    x0 = schedule.predict_start_from_noise(x_t, t, eps)

    from adaface_tpu.models.vae import SD_VAE

    vae_cfg = vae_cfg or SD_VAE
    img = vae_decode(vae_params, jax.lax.stop_gradient(x0), vae_cfg)
    lap = var_of_laplacian(img)
    weight = (lap > lap_var_thres).astype(jnp.float32)
    return x0, weight
