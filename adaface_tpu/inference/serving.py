"""Continuous-batching serving for personalized generation.

The reference serves one subject at a time: `AdaFaceWrapper` writes a
subject's ada embeddings into the text-encoder embedding table
(`adaface/adaface_wrapper.py:461-489`) and then runs the whole diffusers
pipeline for that one subject (`app.py` Gradio flow). Requests for
different subjects serialize, and a new request waits for the previous
full 25/50-step loop.

Here, serving is a first-class TPU path built around two ideas:

1. **Per-sample ada injection.** Instead of mutating the shared embedding
   table, each request's ada embeddings are spliced into its own token
   embeddings (`text_encode(input_embs=...)` — the same injection
   mechanism the training path uses, `modules.py:180-208` in the
   reference). Requests for *different subjects* therefore coexist in one
   device batch.

2. **Continuous batching at denoise-step granularity.** A fixed pool of
   N slots each hold (latent, cond/uncond context, per-slot step index,
   per-slot guidance scale). ONE jitted step advances every active slot
   by one DDIM step — slots are at *different* timesteps; per-slot
   alpha/timestep/guidance values are gathered from precomputed tables by
   the slot's step index. When a slot finishes its trajectory it is
   decoded and immediately refilled from the queue, so the UNet batch
   stays full: throughput stays at the batch-N envelope while per-request
   latency is one trajectory, not queue-length trajectories.

Completion is tracked host-side (every request runs exactly
`num_inference_steps` steps from admission), so the step loop needs no
device→host polling.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Any, Iterator, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models import clip as clip_mod
from adaface_tpu.models.unet import AttnRuntime, unet_apply
from adaface_tpu.models.vae import vae_decode
from adaface_tpu.ops.samplers import DDIMConfig, _alpha_tables, ddim_step
from adaface_tpu.inference.pipeline import PipelineModules

Params = dict[str, Any]


@dataclasses.dataclass
class Request:
    """One generation request. `ada_embs` [K, D] are the subject's ada
    token embeddings (from `prepare_adaface_embeddings(update_text_encoder=
    False)`); None for a plain, non-personalized prompt."""

    prompt: str
    negative_prompt: str = ""
    ada_embs: jax.Array | None = None
    guidance_scale: float = 6.0
    guidance_scale_min: float | None = None
    seed: int = 0
    # CLIP-skip weights over the last k hidden layers (inference default in
    # the reference: fixed [0.25, 0.75] unless randomized; `modules.py:424`)
    skip_weights: Sequence[float] | None = None
    request_id: int = -1  # assigned by submit()


class SlotState(NamedTuple):
    """Device-side slot pool (a pytree; donated through the jitted step)."""

    latents: jax.Array  # [N, 4, h, w]
    cond: jax.Array  # [N, S, D]
    uncond: jax.Array  # [N, S, D]
    step: jax.Array  # [N] int32 — index into the timestep table
    active: jax.Array  # [N] bool
    hi: jax.Array  # [N] f32 guidance scale at step 0
    lo: jax.Array  # [N] f32 guidance scale at the last step


class ContinuousBatcher:
    def __init__(
        self,
        modules: PipelineModules,
        num_slots: int = 8,
        num_inference_steps: int = 25,
        placeholder_token_ids: Sequence[int] | None = None,
        height: int = 512,
        width: int = 512,
        dtype=jnp.bfloat16,
    ):
        self.m = modules
        self.num_slots = num_slots
        self.steps = num_inference_steps
        self.dtype = dtype
        ph = list(placeholder_token_ids or [])
        self._ph_ids = jnp.asarray(ph, jnp.int32) if ph else None
        s = modules.vae_cfg.spatial_scale
        self.latent_hw = (height // s, width // s)
        self.seq_len = modules.text_encoder["position_embedding"].shape[0]

        ddim = DDIMConfig(num_inference_steps=num_inference_steps)
        ts, alpha_t, alpha_prev = _alpha_tables(modules.schedule, ddim)
        self._ts, self._alpha_t, self._alpha_prev = ts, alpha_t, alpha_prev

        self._queue: deque[Request] = deque()
        self._slot_req: list[Request | None] = [None] * num_slots
        self._remaining = np.zeros(num_slots, np.int64)  # host bookkeeping
        self._next_id = 0
        self._state = self._empty_state()
        self._loras = {}
        if modules.attn_lora is not None:
            self._loras["attn"] = modules.attn_lora
        if modules.ffn_lora is not None:
            self._loras["ffn"] = modules.ffn_lora
        self._step_fn = self._build_step()
        self._decode1 = jax.jit(
            lambda vae, z: vae_decode(vae, z, self.m.vae_cfg))
        self._encode = jax.jit(
            functools.partial(self._encode_request_impl,
                              cfg=self.m.text_cfg),
            static_argnames=("use_skip",))

        def write_slot(state: SlotState, slot, latent, cond, uncond,
                       hi, lo) -> SlotState:
            return state._replace(
                latents=state.latents.at[slot].set(latent),
                cond=state.cond.at[slot].set(cond),
                uncond=state.uncond.at[slot].set(uncond),
                step=state.step.at[slot].set(0),
                active=state.active.at[slot].set(True),
                hi=state.hi.at[slot].set(hi),
                lo=state.lo.at[slot].set(lo),
            )

        self._write_slot = jax.jit(write_slot, donate_argnums=(0,))

    # ---------------------------------------------------------------- state
    def _empty_state(self) -> SlotState:
        n, (h, w) = self.num_slots, self.latent_hw
        d = self.m.text_cfg.hidden_size
        return SlotState(
            latents=jnp.zeros((n, 4, h, w), self.dtype),
            cond=jnp.zeros((n, self.seq_len, d), self.dtype),
            uncond=jnp.zeros((n, self.seq_len, d), self.dtype),
            step=jnp.zeros((n,), jnp.int32),
            active=jnp.zeros((n,), bool),
            hi=jnp.ones((n,), jnp.float32),
            lo=jnp.ones((n,), jnp.float32),
        )

    # ------------------------------------------------------------- encoding
    def _encode_request_impl(self, params, ids, nids, ada, skip_w, cfg,
                             use_skip):
        """cond/uncond contexts with per-sample ada injection. ids/nids
        [1, S]; ada [K, D] or None; skip_w [k] or None (static via
        use_skip)."""
        embs = params["token_embedding"][ids]
        if ada is not None and self._ph_ids is not None:
            match = ids[..., None] == self._ph_ids[None, None]  # [1,S,K]
            inj = jnp.einsum("bsk,kd->bsd", match.astype(ada.dtype), ada)
            embs = jnp.where(match.any(-1)[..., None], inj,
                             embs.astype(ada.dtype)).astype(embs.dtype)
        sw = skip_w if use_skip else None
        cond = clip_mod.text_encode(
            params, ids, cfg, input_embs=embs, skip_weights=sw
        )["last_hidden_state"]
        uncond = clip_mod.text_encode(
            params, nids, cfg, skip_weights=sw)["last_hidden_state"]
        return cond.astype(self.dtype), uncond.astype(self.dtype)

    # ----------------------------------------------------------------- step
    def _build_step(self):
        ts, alpha_t, alpha_prev = self._ts, self._alpha_t, self._alpha_prev
        unet_cfg = self.m.unet_cfg
        n_steps = self.steps

        @functools.partial(jax.jit, donate_argnums=(2,))
        def step(unet_params, loras, state: SlotState) -> SlotState:
            x = state.latents
            t = ts[state.step]
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate([state.uncond, state.cond], axis=0)
            rt = AttnRuntime(use_attn_lora="attn" in loras,
                             use_ffn_lora="ffn" in loras,
                             ffn_adapter=self.m.ffn_adapter
                             if "ffn" in loras else None)
            eps2, _ = unet_apply(unet_params, x2, t2, ctx, unet_cfg, rt=rt,
                                 attn_lora=loras.get("attn"),
                                 ffn_lora=loras.get("ffn"))
            eps_u, eps_c = jnp.split(eps2.astype(jnp.float32), 2, axis=0)
            # per-slot linearly interpolated dual guidance scale
            # (`guidance_scales`: linspace hi→lo over the trajectory)
            frac = state.step.astype(jnp.float32) / max(n_steps - 1, 1)
            scale = state.hi + (state.lo - state.hi) * frac
            eps = eps_u + scale[:, None, None, None] * (eps_c - eps_u)
            a_t = alpha_t[state.step][:, None, None, None]
            a_p = alpha_prev[state.step][:, None, None, None]
            x_prev, _ = ddim_step(x, eps, a_t, a_p, eta=0.0)
            keep = state.active[:, None, None, None]
            latents = jnp.where(keep, x_prev.astype(x.dtype), x)
            new_step = jnp.minimum(state.step + state.active, n_steps - 1)
            return state._replace(latents=latents, step=new_step)

        return step

    # ------------------------------------------------------------ admission
    def submit(self, req: Request) -> int:
        req.request_id = self._next_id
        self._next_id += 1
        self._queue.append(req)
        return req.request_id

    def _admit(self, slot: int, req: Request):
        tok = self.m.tokenizer
        ids = jnp.asarray(tok([req.prompt], max_length=self.seq_len))
        nids = jnp.asarray(tok([req.negative_prompt],
                               max_length=self.seq_len))
        ada = (None if req.ada_embs is None
               else jnp.asarray(req.ada_embs, jnp.float32))
        use_skip = req.skip_weights is not None
        skip_w = (jnp.asarray(req.skip_weights, jnp.float32)
                  if use_skip else jnp.zeros((1,), jnp.float32))
        cond, uncond = self._encode(self.m.text_encoder, ids, nids, ada,
                                    skip_w, use_skip=use_skip)
        h, w = self.latent_hw
        latent = jax.random.normal(jax.random.PRNGKey(req.seed),
                                   (4, h, w), self.dtype)
        lo = (req.guidance_scale if req.guidance_scale_min is None
              else req.guidance_scale_min)
        self._state = self._write_slot(
            self._state, jnp.int32(slot), latent, cond[0], uncond[0],
            jnp.float32(req.guidance_scale), jnp.float32(lo))
        self._slot_req[slot] = req
        self._remaining[slot] = self.steps

    def _fill_slots(self):
        for slot in range(self.num_slots):
            if self._slot_req[slot] is None and self._queue:
                self._admit(slot, self._queue.popleft())

    # ----------------------------------------------------------------- run
    def run(self) -> Iterator[tuple[int, np.ndarray]]:
        """Drain the queue; yields (request_id, image [3,H,W] float in
        [0,1]) as each request finishes. The device batch is refilled the
        step a slot frees, so the UNet always runs at full batch while
        work remains."""
        while self._queue or any(r is not None for r in self._slot_req):
            self._fill_slots()
            busy = self._remaining > 0
            n = int(self._remaining[busy].min())  # steps to next completion
            for _ in range(n):
                self._state = self._step_fn(self.m.unet, self._loras,
                                            self._state)
            self._remaining[busy] -= n
            for slot in np.nonzero(busy & (self._remaining == 0))[0]:
                req = self._slot_req[int(slot)]
                z = self._state.latents[int(slot)][None]
                img = self._decode1(self.m.vae, z)
                img = (np.asarray(img, np.float32)[0] + 1.0) / 2.0
                self._slot_req[int(slot)] = None
                self._state = self._state._replace(
                    active=self._state.active.at[int(slot)].set(False))
                yield req.request_id, np.clip(img, 0.0, 1.0)

    def generate_all(self, requests: Sequence[Request]) -> dict[int, np.ndarray]:
        """Convenience: submit everything, run to completion."""
        for r in requests:
            self.submit(r)
        return dict(self.run())
