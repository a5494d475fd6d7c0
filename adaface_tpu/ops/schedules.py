"""Diffusion noise schedules.

TPU-native rebuild of the DDPM schedule machinery in the reference
(`ldm/models/diffusion/ddpm.py:294-431` register_schedule/q_sample/
predict_start_from_noise and `ldm/modules/diffusionmodules/util.py`
make_beta_schedule). All schedule buffers are plain jnp arrays bundled in a
frozen dataclass that is a pytree leaf-container, so it can be closed over by
jitted step functions with zero host sync.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedules matching the reference semantics.

    'linear' is sqrt-space linear (the SD-1.5 "scaled_linear" schedule):
    betas = linspace(sqrt(start), sqrt(end))**2.
    """
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"unknown beta schedule '{schedule}'")
    return betas.astype(np.float64)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM schedule buffers (all [T] fp32 arrays)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        fields = [f.name for f in dataclasses.fields(self)]
        return tuple(getattr(self, n) for n in fields), fields

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    # -- constructors -------------------------------------------------------
    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            schedule, timesteps, linear_start, linear_end, cosine_s
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
        )

    # -- core ops -----------------------------------------------------------
    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Diffuse x_start to timestep t: sqrt(ᾱ_t)·x0 + sqrt(1-ᾱ_t)·ε."""
        a = extract(self.sqrt_alphas_cumprod, t, x_start.shape)
        s = extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape)
        return a * x_start + s * noise

    def predict_start_from_noise(
        self, x_t: jax.Array, t: jax.Array, noise: jax.Array
    ) -> jax.Array:
        """Invert q_sample: x0 = sqrt(1/ᾱ_t)·x_t − sqrt(1/ᾱ_t − 1)·ε."""
        a = extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape)
        s = extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape)
        return a * x_t - s * noise

    def predict_noise_from_start(
        self, x_t: jax.Array, t: jax.Array, x0: jax.Array
    ) -> jax.Array:
        a = extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape)
        s = extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape)
        return (a * x_t - x0) / s

    def q_posterior(self, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
        mean = (
            extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
            + extract(self.posterior_mean_coef2, t, x_t.shape) * x_t
        )
        var = extract(self.posterior_variance, t, x_t.shape)
        log_var = extract(self.posterior_log_variance_clipped, t, x_t.shape)
        return mean, var, log_var

    def velocity(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """v-prediction target: v = sqrt(ᾱ)·ε − sqrt(1−ᾱ)·x0."""
        a = extract(self.sqrt_alphas_cumprod, t, x_start.shape)
        s = extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape)
        return a * noise - s * x_start


def extract(buf: jax.Array, t: jax.Array, broadcast_shape) -> jax.Array:
    """Gather buf[t] ([B]) and reshape to [B,1,1,...] to broadcast over x.

    Equivalent of the reference's `extract_into_tensor`
    (`ldm/modules/diffusionmodules/util.py`).
    """
    out = buf[t].astype(jnp.float32)
    return out.reshape(out.shape[0], *((1,) * (len(broadcast_shape) - 1)))


def ddim_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    steps_offset: int = 1,
    spacing: str = "leading",
) -> np.ndarray:
    """Inference timestep grid, descending, diffusers-DDIMScheduler semantics.

    'leading' spacing with steps_offset=1 matches the reference inference
    config (`adaface/adaface_wrapper.py:236-246`): timesteps
    = (arange(n) * (T//n))[::-1] + offset.
    """
    if spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
        ts += steps_offset
    elif spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64)
        ts -= 1
    elif spacing == "uniform":  # legacy LDM DDIMSampler (`ldm/.../ddim.py`)
        c = num_train_timesteps // num_inference_steps
        ts = (np.asarray(list(range(0, num_train_timesteps, c))) + 1)[::-1].copy()
    else:
        raise ValueError(f"unknown timestep spacing '{spacing}'")
    return np.clip(ts.astype(np.int64), 0, num_train_timesteps - 1)
