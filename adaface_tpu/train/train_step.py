"""Jitted training steps (stage-1: normal-recon and unet-distill iterations).

The reference's `training_step` → `shared_step` → `p_losses` pipeline
(`ldm/models/diffusion/ddpm.py:434-2494`) is re-expressed as a small set of
pure step functions selected by a host-side iteration plan (SURVEY §7:
"probabilistic control flow → branch-by-schedule"): each iteration type is
one jitted graph with static shapes; per-step randomness comes in through
the batch (pre-sampled timesteps/noises) or an explicit PRNG key.

The trainable pytree holds the SubjBasisGenerator(s) (+ optional UNet
LoRAs); the UNet/VAE/CLIP towers are frozen inputs. Data parallelism:
params replicated, batch sharded on the mesh 'dp' axis — XLA inserts the
gradient psum automatically (replaces DDP/NCCL, SURVEY §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from adaface_tpu.id2ada.subj_basis_generator import SubjBasisConfig, subj_basis_forward
from adaface_tpu.models import clip as clip_mod
from adaface_tpu.models.unet import AttnRuntime, UNetConfig, unet_apply
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.text.embedding_manager import splice_ada_embeddings
from adaface_tpu.train.losses import (
    calc_prompt_emb_delta_loss,
    calc_recon_and_suppress_losses,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    unet: UNetConfig = UNetConfig()
    sbg: SubjBasisConfig = SubjBasisConfig()
    clip_text: clip_mod.CLIPTextConfig = clip_mod.CLIP_L_TEXT
    recon_bg_pixel_weight: float = 0.1
    prompt_emb_delta_weight: float = 1e-4  # `v1-distill-joint-ada.yaml`
    mb_suppress_weight: float = 0.1
    unet_distill_weight: float = 8.0
    clip_skip_weights: tuple = (0.25, 0.75)  # last-2-layer CLIP skip
    # ada-embedding training perturbation (`embedding_manager.py:379-388`
    # via anneal_perturb_embedding): relative-std range + per-iter prob
    training_perturb_std_range: tuple = (0.05, 0.1)
    training_perturb_prob: float = 0.5


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class State:
    params: Params
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def compute_ada_embs(
    trainable: Params,
    frozen: Params,
    img_prompt_embs: jax.Array,  # [B, sum(K_i), D]
    cfg: TrainConfig,
    out_id_embs_cfg_scale: float = 1.0,
    enable_static_img_suffix_embs: bool = False,
) -> jax.Array:
    """Map teacher img-prompt embeddings → ada embeddings through the
    SubjBasisGenerator(s). With a joint encoder (`Joint_FaceID2AdaPrompt`,
    reference `face_id_to_ada_prompt.py:868-1302`) cfg.sbg is a tuple of
    per-encoder configs and trainable['sbg']/frozen['sbg_buffers'] are
    matching lists; each SBG maps its own token segment (16 arc2face +
    4 consistentID) and the ada embeddings concatenate along tokens."""
    sbg_cfgs = cfg.sbg if isinstance(cfg.sbg, (list, tuple)) else (cfg.sbg,)
    params = (trainable["sbg"] if isinstance(trainable["sbg"], (list, tuple))
              else (trainable["sbg"],))
    bufs = (frozen["sbg_buffers"]
            if isinstance(frozen["sbg_buffers"], (list, tuple))
            else (frozen["sbg_buffers"],))
    outs, off = [], 0
    for p, bf, c in zip(params, bufs, sbg_cfgs):
        seg = img_prompt_embs[:, off:off + c.num_id_vecs]
        outs.append(subj_basis_forward(
            {"params": p, "buffers": bf}, seg, c,
            out_id_embs_cfg_scale=out_id_embs_cfg_scale, is_face=True,
            enable_static_img_suffix_embs=enable_static_img_suffix_embs))
        off += c.num_id_vecs
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _encode_prompts_with_ada(
    frozen: Params,
    ada_embs: jax.Array,  # [B, K, D]
    batch: Params,
    cfg: TrainConfig,
    return_extras: bool = False,
):
    """Embed the 4-block prompts (ss/sc/cs/cc), splicing ada embeddings into
    the subject blocks (`get_text_conditioning`, `ddpm.py:739-853`).

    With return_extras, also returns {"cs_raw", "cc_raw", "uncond"} — the
    UNDISTRIBUTED class contexts (the reference keeps both:
    `extra_info['cls_single_emb']` at `ddpm.py:1545` is pre-distribution
    and conditions the recon cls denoise, while the `_dist` versions at
    `ddpm.py:1464-1472` feed the prompt-delta loss)."""
    ids = batch["prompt_ids"]  # [4B, S]
    splice_map = batch["splice_map"]  # [4B, S] (−1 on cls rows)
    table = frozen["text_encoder"]["token_embedding"]
    base = table[ids]
    b = ada_embs.shape[0]
    ada4 = jnp.concatenate(
        [ada_embs, ada_embs, jnp.zeros_like(ada_embs), jnp.zeros_like(ada_embs)],
        axis=0,
    )
    embs = splice_ada_embeddings(base, ada4, splice_map)
    if batch.get("merge_map") is not None:
        # sum multi-token cls-delta embeddings into one slot + left shift
        # (`merge_cls_token_embeddings` via the EmbeddingManager)
        from adaface_tpu.text.embedding_manager import apply_merge_map

        embs = apply_merge_map(embs, batch["merge_map"])
    # per-iteration Dirichlet-sampled CLIP-skip weights when provided
    # (`randomize_clip_skip_weights`, `modules.py:424-452`), else the
    # configured constants
    skip_w = batch.get("clip_skip_weights")
    if skip_w is None:
        skip_w = jnp.asarray(cfg.clip_skip_weights)
    out = clip_mod.text_encode(
        frozen["text_encoder"],
        ids,
        cfg.clip_text,
        input_embs=embs,
        skip_weights=skip_w,
    )
    ctx = out["last_hidden_state"]
    extras = {}
    if batch.get("uncond_ids") is not None:
        # distribute the merged class embedding over the M subject-token
        # positions of the cls blocks, with compel-style embedding CFG and
        # magnitude boost (`forward` → distribute_embedding_to_M_tokens_
        # by_dict, `ddpm.py:1455-1472`); positions come from the aligned
        # subject-single block's splice map
        from adaface_tpu.text.embedding_manager import (
            distribute_embedding_to_M_tokens)

        uncond = clip_mod.text_encode(
            frozen["text_encoder"], batch["uncond_ids"], cfg.clip_text,
            skip_weights=skip_w)["last_hidden_state"]
        # the reference indexes BOTH cls blocks with the subject-single
        # block's placeholder indices (`placeholder2indices_1b`)
        ss_map, _, _, _ = jnp.split(splice_map, 4, axis=0)
        ss, sc, cs, cc = jnp.split(ctx, 4, axis=0)
        extras = {"cs_raw": cs, "cc_raw": cc, "uncond": uncond}
        cs = distribute_embedding_to_M_tokens(cs, ss_map, uncond)
        cc = distribute_embedding_to_M_tokens(cc, ss_map, uncond)
        ctx = jnp.concatenate([ss, sc, cs, cc], axis=0)
    if return_extras:
        return ctx, extras
    return ctx


def recon_loss_fn(
    trainable: Params,
    frozen: Params,
    batch: Params,
    schedule: DiffusionSchedule,
    cfg: TrainConfig,
    rng: jax.Array,
):
    """Normal-recon iteration loss (`calc_normal_recon_loss`,
    `ddpm.py:2593-2883`, single-step variant).

    batch (all device arrays, [B] leading unless noted):
      x_start [B,4,64,64] latents; noise like x_start; t [B];
      img_prompt_embs [B,K0,768] teacher image-prompt embeddings;
      prompt_ids/splice_map/prompt_emb_mask [4B,…] 4-block prompts;
      img_mask/fg_mask [B,1,64,64]; face_detected [B].
    """
    ada = compute_ada_embs(trainable, frozen, batch["img_prompt_embs"], cfg)
    if cfg.training_perturb_prob > 0:
        from adaface_tpu.utils.tensor import anneal_perturb_embedding

        rng, k_pert = jax.random.split(rng)
        ada = anneal_perturb_embedding(
            k_pert, ada, 0.0, cfg.training_perturb_std_range, None,
            cfg.training_perturb_prob)

    ctx4 = _encode_prompts_with_ada(frozen, ada, batch, cfg)
    b = batch["x_start"].shape[0]
    ctx_subj = ctx4[:b]  # subject-single block conditions the denoise
    ctx_cls = ctx4[2 * b:3 * b]  # class-single block for bg recon guidance

    x_t = schedule.q_sample(batch["x_start"], batch["t"], batch["noise"])
    subj_mask = (batch["splice_map"][:b] >= 0).astype(jnp.float32)

    # per-iter-type named adapters (`set_up_ffn_loras`/
    # `set_lora_and_capture_flags`, `diffusers_attn_lora_capture.py:541-629`)
    rt = AttnRuntime(
        capture=True,
        use_attn_lora="attn_lora" in trainable,
        use_ffn_lora="ffn_lora" in trainable,
        ffn_adapter="recon_loss",
    )
    # unfreeze_unet path (`v1-finetune-unet.yaml`): the UNet lives in
    # `trainable` and receives gradients directly
    unet_params = trainable.get("unet", frozen["unet"])
    dt = _params_dtype(unet_params)  # bf16 towers → bf16 compute
    eps_pred, cap = unet_apply(
        unet_params, x_t.astype(dt), batch["t"], ctx_subj.astype(dt),
        cfg.unet,
        rt=rt,
        img_mask=batch.get("img_mask"),
        subj_mask=subj_mask,
        attn_lora=trainable.get("attn_lora"),
        ffn_lora=trainable.get("ffn_lora"),
    )
    eps_pred = eps_pred.astype(x_t.dtype)
    # class-conditioned prediction for background guidance (no grad)
    eps_cls, _ = unet_apply(
        jax.lax.stop_gradient(unet_params), x_t.astype(dt), batch["t"],
        jax.lax.stop_gradient(ctx_cls).astype(dt), cfg.unet,
    )
    eps_cls = eps_cls.astype(x_t.dtype)

    loss_recon, loss_recon_cls, loss_mb = calc_recon_and_suppress_losses(
        batch["noise"], eps_pred, eps_cls, batch.get("face_detected"),
        cap.get("attn", {}), subj_mask, batch.get("img_mask"),
        batch.get("fg_mask"), cfg.recon_bg_pixel_weight,
    )
    loss_delta = calc_prompt_emb_delta_loss(ctx4, batch.get("prompt_emb_mask"))

    loss = (
        loss_recon
        + 0.1 * loss_recon_cls
        + cfg.mb_suppress_weight * loss_mb
        + cfg.prompt_emb_delta_weight * loss_delta
    )
    metrics = {
        "loss": loss,
        "loss_recon": loss_recon,
        "loss_recon_cls": loss_recon_cls,
        "loss_mb_suppress": loss_mb,
        "loss_prompt_emb_delta": loss_delta,
    }
    return loss, metrics


def _params_dtype(params: Params):
    """Floating dtype of a param tree (the UNet compute dtype follows
    its weights: bf16 production towers run in bf16 like the reference's
    fp16 autocast, fp32 test towers stay exact)."""
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            return leaf.dtype
    return jnp.float32


def unet_distill_loss_fn(
    trainable: Params,
    frozen: Params,
    batch: Params,
    schedule: DiffusionSchedule,
    cfg: TrainConfig,
    rng: jax.Array,
):
    """UNet-distillation iteration (`calc_unet_distill_loss`,
    `ddpm.py:2984-3184`, single-step): student denoises with ada prompts and
    matches the teacher's noise prediction made with img-prompt embeddings.

    batch additionally carries teacher_noise_pred [B,4,64,64] (precomputed
    frozen-teacher outputs — the teacher runs in its own jit, possibly on
    other devices).
    """
    ada = compute_ada_embs(trainable, frozen, batch["img_prompt_embs"], cfg,
                           enable_static_img_suffix_embs=True)
    ctx4 = _encode_prompts_with_ada(frozen, ada, batch, cfg)
    b = batch["x_start"].shape[0]

    if "teacher_x_ts" in batch:
        # multi-step distillation (`calc_unet_distill_loss:2984-3184`): the
        # student denoises the teacher's own x_t chain (same timesteps)
        # with ada prompts and matches each step's teacher prediction. The
        # S steps fold into the batch axis — one UNet call.
        x_ts = batch["teacher_x_ts"]  # [S, B, 4, h, w]
        ts = batch["teacher_ts"]  # [S, B]
        teacher_preds = batch["teacher_noise_preds"]  # [S, B, 4, h, w]
        s = x_ts.shape[0]
        x_flat = x_ts.reshape(s * b, *x_ts.shape[2:])
        t_flat = ts.reshape(s * b)
        ctx_rep = jnp.tile(ctx4[:b], (s, 1, 1))
        rt = AttnRuntime(
            use_ffn_lora="ffn_lora" in trainable,
            ffn_adapter="unet_distill",
        )
        # compute dtype follows the UNet weights: fp32 batch × bf16
        # weights would promote every conv to f32 — measured ~4× step
        # cost on v5e; the reference fp16-autocasts this region
        # (`ddpm.py:4225`)
        unet_p = trainable.get("unet", frozen["unet"])
        dt = _params_dtype(unet_p)
        eps_pred, _ = unet_apply(
            unet_p, x_flat.astype(dt), t_flat, ctx_rep.astype(dt),
            cfg.unet, rt=rt, ffn_lora=trainable.get("ffn_lora"))
        diff = (eps_pred.astype(jnp.float32)
                - jax.lax.stop_gradient(
                    teacher_preds.reshape(s * b, *x_ts.shape[2:])
                ).astype(jnp.float32)) ** 2
        loss_distill = diff.mean()
    else:
        x_t = schedule.q_sample(batch["x_start"], batch["t"], batch["noise"])
        rt = AttnRuntime(
            use_ffn_lora="ffn_lora" in trainable,
            ffn_adapter="unet_distill",
        )
        unet_p = trainable.get("unet", frozen["unet"])
        dt = _params_dtype(unet_p)
        eps_pred, _ = unet_apply(
            unet_p, x_t.astype(dt), batch["t"], ctx4[:b].astype(dt),
            cfg.unet, rt=rt, ffn_lora=trainable.get("ffn_lora"))
        diff = (eps_pred.astype(jnp.float32)
                - batch["teacher_noise_pred"].astype(jnp.float32)) ** 2
        loss_distill = diff.mean()
    loss_delta = calc_prompt_emb_delta_loss(ctx4, batch.get("prompt_emb_mask"))
    loss = cfg.unet_distill_weight * loss_distill \
        + cfg.prompt_emb_delta_weight * loss_delta
    return loss, {"loss": loss, "loss_unet_distill": loss_distill,
                  "loss_prompt_emb_delta": loss_delta}


def make_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    frozen: Params,
    schedule: DiffusionSchedule,
    cfg: TrainConfig,
    donate: bool = True,
):
    """Build the jitted step: grad → optimizer → new state + metrics.

    With batch sharded over 'dp' and params replicated, XLA emits the
    gradient all-reduce over ICI automatically.

    `frozen`'s array leaves are threaded through as jit ARGUMENTS, not a
    closure capture: a captured 860M-param pytree would be baked into the
    HLO as >2GB of constants (unshareable between programs, re-uploaded
    per compile — it broke the single-chip compile outright). Non-array
    leaves (e.g. sbg_buffers' `id_start`, which must stay a static python
    int for slicing) remain closed over.
    """
    jtu = jax.tree_util
    treedef = jtu.tree_structure(frozen)
    is_arr = [hasattr(l, "shape") and hasattr(l, "dtype")
              for l in jtu.tree_leaves(frozen)]
    static_leaves = [None if a else l
                     for l, a in zip(jtu.tree_leaves(frozen), is_arr)]

    def _rebuild(arrays):
        it = iter(arrays)
        return jtu.tree_unflatten(
            treedef,
            [next(it) if a else s for a, s in zip(is_arr, static_leaves)])

    def step(frozen_arrays, state: State, batch: Params, rng: jax.Array):
        frozen_ = _rebuild(frozen_arrays)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, frozen_, batch, schedule, cfg, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return State(params, opt_state, state.step + 1), metrics

    jitted = jax.jit(step, donate_argnums=(1,) if donate else ())

    def run(state: State, batch: Params, rng: jax.Array):
        # re-read `frozen` each call so UNet weight hot-swaps are picked up
        arrays = [l for l, a in zip(jtu.tree_leaves(frozen), is_arr) if a]
        return jitted(arrays, state, batch, rng)

    return run


def make_frozen_caller(fn: Callable, frozen: Params):
    """Jit `fn(frozen, *args)` with frozen's ARRAY leaves threaded as jit
    arguments (same rationale as make_train_step: a closure capture would
    bake the 860M-param stack into the HLO as constants). Non-array
    leaves stay closed over; `frozen` is re-read per call so UNet weight
    hot-swaps are picked up."""
    jtu = jax.tree_util
    treedef = jtu.tree_structure(frozen)
    is_arr = [hasattr(l, "shape") and hasattr(l, "dtype")
              for l in jtu.tree_leaves(frozen)]
    static_leaves = [None if a else l
                     for l, a in zip(jtu.tree_leaves(frozen), is_arr)]

    def _rebuild(arrays):
        it = iter(arrays)
        return jtu.tree_unflatten(
            treedef,
            [next(it) if a else s for a, s in zip(is_arr, static_leaves)])

    jitted = jax.jit(lambda arrays, *args: fn(_rebuild(arrays), *args))

    def run(*args):
        arrays = [l for l, a in zip(jtu.tree_leaves(frozen), is_arr) if a]
        return jitted(arrays, *args)

    return run


def init_state(trainable: Params, optimizer: optax.GradientTransformation) -> State:
    return State(trainable, optimizer.init(trainable), jnp.zeros((), jnp.int32))
