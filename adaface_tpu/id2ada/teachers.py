"""Frozen UNet teachers for stage-1 distillation.

Rebuild of `adaface/unet_teachers.py`: a teacher denoises for ≤10 steps
using the *student's* noise schedule (q_sample / predict_start_from_noise),
with probabilistic CFG (scale sampled from a range) and successive
timesteps sampled inside [t·0.5^k, t·0.7^k] of the current timestep
(`UNetTeacher.forward:64-187`). The whole multi-step loop is one
`lax.scan` — timestep chains are sampled in-graph from a PRNG key, so a
teacher pass is a single XLA program.

Teachers: Arc2FaceTeacher (cfg range [1,1]), ConsistentIDTeacher,
UNetEnsembleTeacher (weighted average of multiple UNets,
`adaface/util.py:174-247` UNetEnsemble), SimpleUNetTeacher.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.unet import SD15_UNET, UNetConfig, unet_apply
from adaface_tpu.ops.schedules import DiffusionSchedule

Params = dict[str, Any]


@dataclasses.dataclass
class UNetTeacher:
    name: str = "simple_unet"
    unet_params: Params | list[Params] | None = None
    unet_cfg: UNetConfig = SD15_UNET
    p_uses_cfg: float = 0.0
    cfg_scale_range: tuple[float, float] = (1.3, 2.0)
    unet_weights: Sequence[float] | None = None  # ensemble weights

    # ---------------------------------------------------------------- plan
    def sample_cfg_scale(self, rng: np.random.RandomState,
                         force_uses_cfg: bool = False) -> float:
        """Host-side per-iteration CFG plan (`forward:70-99`)."""
        uses = force_uses_cfg or (
            self.p_uses_cfg > 0 and rng.rand() < self.p_uses_cfg)
        if not uses:
            return 1.0
        return float(rng.uniform(*self.cfg_scale_range))

    # -------------------------------------------------------------- device
    def _unet_eps(self, x, t, context):
        if isinstance(self.unet_params, (list, tuple)):
            # UNetEnsemble: weighted average of member outputs
            w = self.unet_weights or [1.0 / len(self.unet_params)] * len(
                self.unet_params)
            w = jnp.asarray(w) / jnp.asarray(w).sum()
            preds = [
                unet_apply(p, x, t, context, self.unet_cfg)[0]
                for p in self.unet_params
            ]
            return sum(wi * p for wi, p in zip(w, preds))
        return unet_apply(self.unet_params, x, t, context, self.unet_cfg)[0]

    def __call__(
        self,
        schedule: DiffusionSchedule,
        x_start: jax.Array,  # [B, 4, h, w]
        noise: jax.Array,  # [B, 4, h, w] initial noise
        t: jax.Array,  # [B] initial timesteps
        teacher_context: jax.Array,  # [B, S, D] (pos) or [2B, S, D] (neg‖pos)
        negative_context: jax.Array | None = None,
        num_denoising_steps: int = 1,
        cfg_scale: float | jax.Array = 1.0,
        rng: jax.Array | None = None,
        same_t_noise_across_instances: bool = False,
        global_t_lb: int = 0,
        global_t_ub: int = 1000,
    ):
        """→ (noise_preds [S,B,…], x_starts [S+1,B,…], noises [S,B,…],
        ts [S,B]). All teacher weights frozen (stop_gradient)."""
        assert num_denoising_steps <= 10
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        b = x_start.shape[0]
        if same_t_noise_across_instances:
            t = jnp.broadcast_to(t[:1], t.shape)
            noise = jnp.broadcast_to(noise[:1], noise.shape)

        uses_cfg = negative_context is not None or (
            not isinstance(cfg_scale, float) or cfg_scale > 1.0)
        cfg_scale = jnp.asarray(cfg_scale, jnp.float32)

        # shrink-factor exponent (`forward:163-175`)
        k = np.power(max(num_denoising_steps - 1, 1), -0.3)
        shrink_lb, shrink_ub = np.power(0.5, k), np.power(0.7, k)

        ctx = jax.lax.stop_gradient(teacher_context)
        neg = (jax.lax.stop_gradient(negative_context)
               if negative_context is not None else None)

        def step(carry, key):
            x0, t, noise = carry
            x_noisy = schedule.q_sample(x0, t, noise)
            if uses_cfg and neg is not None:
                pos_pred = self._unet_eps(x_noisy, t, ctx)
                neg_pred = self._unet_eps(x_noisy, t, neg)
                eps = pos_pred * cfg_scale - neg_pred * (cfg_scale - 1.0)
            elif uses_cfg:
                # ctx is [neg‖pos] doubled along batch
                x2 = jnp.concatenate([x_noisy, x_noisy], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                both = self._unet_eps(x2, t2, ctx)
                pos_pred, neg_pred = jnp.split(both, 2, axis=0)
                eps = pos_pred * cfg_scale - neg_pred * (cfg_scale - 1.0)
            else:
                eps = self._unet_eps(x_noisy, t, ctx)
            pred_x0 = schedule.predict_start_from_noise(x_noisy, t, eps)

            k1, k2 = jax.random.split(key)
            rel = jax.random.uniform(k1, t.shape)
            t_lb = jnp.clip(t.astype(jnp.float32) * shrink_lb, min=global_t_lb)
            t_ub = jnp.clip(t.astype(jnp.float32) * shrink_ub, max=global_t_ub)
            t_next = ((t_ub - t_lb) * rel + t_lb).astype(jnp.int32)
            noise_next = jax.random.normal(k2, x0.shape, x0.dtype)
            if same_t_noise_across_instances:
                t_next = jnp.broadcast_to(t_next[:1], t_next.shape)
                noise_next = jnp.broadcast_to(noise_next[:1], noise_next.shape)
            return (pred_x0, t_next, noise_next), (eps, pred_x0, noise, t)

        keys = jax.random.split(rng, num_denoising_steps)
        (x0_final, _, _), (noise_preds, x_starts, noises, ts) = jax.lax.scan(
            step, (x_start, t, noise), keys)
        x_starts_full = jnp.concatenate([x_start[None], x_starts], axis=0)
        return (jax.lax.stop_gradient(noise_preds),
                jax.lax.stop_gradient(x_starts_full),
                noises, ts)


def create_unet_teacher(teacher_type, **kwargs) -> UNetTeacher:
    """`create_unet_teacher` (`unet_teachers.py:9-40`)."""
    if isinstance(teacher_type, (tuple, list)) and len(teacher_type) == 1:
        teacher_type = teacher_type[0]
    if teacher_type == "arc2face":
        # Arc2Face never uses CFG (`Arc2FaceTeacher`: cfg range [1,1])
        kwargs.setdefault("cfg_scale_range", (1.0, 1.0))
        return UNetTeacher(name="arc2face", **kwargs)
    if teacher_type == "consistentID":
        kwargs.setdefault("p_uses_cfg", 0.5)
        return UNetTeacher(name="consistentID", **kwargs)
    if teacher_type == "simple_unet":
        return UNetTeacher(name="simple_unet", **kwargs)
    if teacher_type == "unet_ensemble" or isinstance(teacher_type, (tuple, list)):
        return UNetTeacher(name="unet_ensemble", **kwargs)
    raise NotImplementedError(f"teacher type {teacher_type}")
