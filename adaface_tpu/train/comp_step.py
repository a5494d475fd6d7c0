"""Stage-2 compositional-distillation training step.

Reference-exact rebuild of the comp-distill iteration:

1. `prime_comp_x_start` (`prime_x_start_for_comp_prompts`,
   `ddpm.py:1923-1985`): two priming instances — subj-single and
   cls-mix-comp (mix ratio `0.5 + cls_subj_mix_ratio/2 = 0.8`,
   `ddpm.py:2398`) — start from fresh noise at t∈[0.7, 0.9]·T and are
   denoised 3-4 steps by the priming (SAR/comp) UNet with CFG against the
   uncond context, scale ~ U(2, 4) (`ddpm.py:595-610`,
   `unet_teachers.py:64-187`). The primed starts are assigned per block as
   [ss, cc, cc, cc] (`ddpm.py:2405-2410`).
2. `comp_distill_denoise` (`comp_distill_multistep_denoise`,
   `ddpm.py:1997-2092`): 4 denoising steps of the 4-block batch
   [ss ‖ sc ‖ sc_rep ‖ cc_mix] (cc_mix = sc·0.4 + cc·0.6, `ddpm.py:1512`)
   from t∈[0.45, 0.65]·T, each step CFG 2.5 against uncond
   (`ddpm.py:2427`), chaining x_starts through detached x_recons; the
   next timestep follows the teacher's power-law chain
   t·[0.5^p, 0.7^p], p = (S-1)^-0.3 (`ddpm.py:2060-2076`). Per-block
   gradient gating replaces the reference's sliced no-grad UNet calls
   (`guided_denoise` batch_part_has_grad='subject-compos',
   `ddpm.py:1630-1712`) — only the SC block carries gradients; attn LoRA
   applies to ss/sc/sr but never mc; cross-attn normalization applies to
   sc/sc_rep only; the comp ffn LoRA flips on for 50% of steps.
3. `comp_distill_loss_fn`: assembles the stage-2 losses from the captured
   activations (`calc_comp_feat_distill_loss:3190-3600`); the prompt-delta
   loss runs on the [ss, sc, cs_dist, cc_dist] context with the original
   masks, exactly like `p_losses` (`ddpm.py:2286-2293` on
   `prompt_emb_4b_orig_dist`).

Randomness is materialized up front by `sample_comp_rand` (one PRNG
stream → a dict of arrays mirroring every torch.randn/rand/randint draw of
the reference), so golden tests can inject the oracle's exact draws.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models import clip as clip_mod
from adaface_tpu.models.unet import AttnRuntime, unet_apply
from adaface_tpu.train.comp_face_align import comp_identity_losses
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.text.embedding_manager import (
    distribute_embedding_to_M_tokens,
    splice_ada_embeddings,
)
from adaface_tpu.train.comp_losses import (
    calc_comp_subj_bg_preserve_loss,
    calc_sc_rep_attn_distill_loss,
    calc_subj_attn_cross_t_diff_loss,
)
from adaface_tpu.train.losses import (
    calc_attn_norm_loss,
    calc_prompt_emb_delta_loss,
    calc_subj_masked_bg_suppress_loss,
)
from adaface_tpu.train.train_step import TrainConfig, compute_ada_embs

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CompDistillConfig:
    # alternates 4/3 across comp iterations via the IterationPlanner
    # (`ddpm.py:2388`: comp_iters_count % 2 - 1 + max(4))
    num_priming_steps: int = 4
    num_denoising_steps: int = 4  # num_comp_distill_denoising_steps (`:107`)
    priming_t_range: tuple[float, float] = (0.7, 0.9)  # t_rear (`:1936`)
    denoise_t_range: tuple[float, float] = (0.45, 0.65)  # t_midrear (`:2413`)
    # subj-comp ‖ cls-comp mixing for the denoised cc block
    # (`ddpm.py:84,1512`): cc_mix = sc·(1-r) + cc·r — 60% CLASS; priming
    # uses the stronger 0.5 + r/2 = 0.8 (`:2398`)
    cls_subj_mix_ratio: float = 0.6
    priming_cfg_scale_range: tuple[float, float] = (2.0, 4.0)  # `:608`
    denoise_cfg_scale: float = 2.5  # `:2427`
    # ps_comp_attn_aug = [0, 1, 0] (`:138`): always normalize, never mix
    normalize_cross_attn: bool = True
    mix_sc_mc_attn: bool = False
    use_attn_lora: bool = True  # unet_uses_attn_lora (`:128`)
    use_ffn_lora: bool = True  # comp_uses_ffn_lora (`:130`)
    p_comp_ffn_lora: float = 0.5  # per-step gate (`guided_denoise:1640`)
    res_hidden_gradscale: float = 0.5  # `:141`
    # calc_attn_norm_loss is DEAD CODE in the reference at this snapshot
    # (defined at `ldm/util.py:1756` but never called) — computed as a
    # monitor metric here; weight 0 for behavioral parity
    attn_norm_weight: float = 0.0
    # the reference adds loss_comp_rep_distill UNWEIGHTED with its own
    # internal scales (`ddpm.py:3574-3590`); this knob stays for ablation
    rep_distill_weight: float = 1.0
    fg_bg_preserve_weight: float = 1.0
    # monitor-only in the reference: the contribution to the total loss is
    # commented out ("* 0 => DISABLED", `ddpm.py:3553-3556`)
    cross_t_diff_weight: float = 0.0
    mb_suppress_weight: float = 0.1
    prompt_emb_delta_weight: float = 1e-4
    # Probability of seeding the comp x_start from the training image's
    # fg region (`ldm/util.py:1599-1677`; the reference keeps the helper
    # but leaves it uncalled at this snapshot, so we default to 0.0 for
    # behavioral parity — set >0 in YAML to enable).
    p_init_fg_from_training_image: float = 0.0
    # GMA latent-flow candidate in the elastic-matching loss
    # (`--use_face_flow_for_sc_matching_loss`, default False in the
    # reference, `main.py:261-262`). When True, `frozen['flow']` must hold
    # {'gma': gma params} (convert_gma_state_dict of gma-sintel.pth).
    use_face_flow: bool = False
    small_motion_ignore_thres: float = 0.3
    # UNet compute dtype: bfloat16 on TPU (the reference autocasts to fp16,
    # `ddpm.py:4225`); golden tests set "float32" for exact parity
    compute_dtype: str = "bfloat16"
    # ---- identity-loss family (`ddpm.py:3225-3464,3602-3733`) ----
    arcface_align_loss_weight: float = 0.01  # `:127`
    comp_sc_face_align_loss_thres: float = 0.7  # `:97`
    comp_ss_face_confidence_thres: float = 0.99  # `:111`
    comp_sc_subj_mb_suppress_loss_weight: float = 0.2  # `:87`
    sc_fg_face_suppress_mask_shrink_ratio: float = 0.3  # `:90`
    comp_sc_fg_mask_percent_range: tuple[float, float] = (0.0225, 0.36)
    redenoise_crop_mix_weights: tuple = (0.5, 0.25, 0.25)  # `:109`
    lap_vars_tolerance: float = 0.3  # `:113`
    max_arcface_align_loss_count: int = 3  # `ddpm.py:3608`
    rep_dist_fg_bounds: tuple = (0.1, 0.20, 0.25)  # `ddpm.py:3220`
    max_bg_faces: int = 2
    vae_cfg: Any = None  # tiny towers in tests; None → SD_VAE
    # detection-frame size of the collect phases (see
    # comp_face_align._detect_size); 0 = full res (tests pin full res so
    # three-phase == callback-mode equality is exact)
    collect_px_size: int = 256


def _chain_power(num_steps: int) -> float:
    """p such that the next timestep ∈ t·[0.5^p, 0.7^p]
    (`unet_teachers.py:162-175`, reused by `ddpm.py:2060-2076`)."""
    return float(np.power(max(num_steps - 1, 1), -0.3))


def sample_comp_rand(
    rng: jax.Array,
    noise: jax.Array,  # [B, 4, h, w] — the p_losses noise (`ddpm.py:2278`)
    schedule: DiffusionSchedule,
    cfg: CompDistillConfig,
) -> Params:
    """Materialize every random draw of the comp iteration as arrays, in
    the order the reference makes them. Golden tests replace this dict
    with the oracle's recorded draws."""
    b = noise.shape[0]
    sh = noise.shape[1:]
    t_total = schedule.num_timesteps
    n_p, n_d = cfg.num_priming_steps, cfg.num_denoising_steps
    ks = jax.random.split(rng, 9)

    # priming: initial noise is the caller's noise, collapsed to the first
    # instance (same_t_noise_across_instances, `unet_teachers.py:112-115`);
    # later steps draw fresh noise, likewise collapsed (`:170-180`)
    prime_noises = [noise[:1]]
    for k in jax.random.split(ks[0], max(n_p - 1, 1))[: n_p - 1]:
        prime_noises.append(jax.random.normal(k, (1, *sh), noise.dtype))
    return {
        # x_start_2 = torch.randn_like(x_start)[:B].repeat(2) (`:1932`)
        "prime_x0": jax.random.normal(ks[1], noise.shape, noise.dtype),
        "prime_t0": jax.random.randint(
            ks[2], (), int(cfg.priming_t_range[0] * t_total),
            int(cfg.priming_t_range[1] * t_total)),
        "prime_cfg_scale": jax.random.uniform(
            ks[3], (), minval=cfg.priming_cfg_scale_range[0],
            maxval=cfg.priming_cfg_scale_range[1]),
        "prime_noises": jnp.stack(prime_noises),  # [Np, 1, 4, h, w]
        "prime_rel_ts": jax.random.uniform(ks[4], (max(n_p - 1, 0),)),
        # main denoise: noise regenerated after priming (`ddpm.py:2403`),
        # per step fresh + shared across the 4 blocks (`:2057-2059`)
        "den_t0": jax.random.randint(
            ks[5], (b,), int(cfg.denoise_t_range[0] * t_total),
            int(cfg.denoise_t_range[1] * t_total)),
        "den_noises": jax.random.normal(ks[6], (n_d, b, *sh), noise.dtype),
        "den_rel_ts": jax.random.uniform(ks[7], (max(n_d - 1, 0), b)),
        # 50%-probability comp ffn LoRA per guided_denoise call (`:1640`)
        "den_ffn_gates": (jax.random.uniform(ks[8], (n_d,)) < cfg.p_comp_ffn_lora
                          ).astype(jnp.float32),
    }


def prime_comp_x_start(
    unet_params: Params,
    unet_cfg,
    schedule: DiffusionSchedule,
    ctx_subj_single: jax.Array,  # [B, S, D]
    ctx_cls_mix_prime: jax.Array,  # [B, S, D] sc·0.2 + cc·0.8
    uncond_ctx: jax.Array,  # [1, S, D]
    rand: Params,
    cfg: CompDistillConfig = CompDistillConfig(),
):
    """No-grad priming (`prime_x_start_for_comp_prompts` through the
    always-CFG priming teacher, `ddpm.py:1923-1985` + `unet_teachers.py:
    64-187`) → (x_primed_single [B,…], x_primed_comp [B,…])."""
    b = ctx_subj_single.shape[0]
    dt = jnp.dtype(cfg.compute_dtype)
    n_steps = cfg.num_priming_steps
    x = jnp.tile(rand["prime_x0"], (2, 1, 1, 1))  # [2B]: same start, 2 ctxs
    t = jnp.full((2 * b,), rand["prime_t0"], jnp.int32)
    ctx2 = jnp.concatenate([ctx_subj_single, ctx_cls_mix_prime],
                           axis=0).astype(dt)
    un2 = jnp.broadcast_to(uncond_ctx, (2 * b, *uncond_ctx.shape[1:])
                           ).astype(dt)
    ctx4 = jnp.concatenate([ctx2, un2], axis=0)
    s = rand["prime_cfg_scale"]
    p = _chain_power(n_steps)
    lb_f, ub_f = 0.5 ** p, 0.7 ** p

    # lax.scan instead of a python unroll: ONE UNet body in the HLO for
    # all priming steps — the unrolled 4-step graph was a major factor in
    # the relay compile-helper OOM (VERDICT r4 #1)
    rel_ts = rand["prime_rel_ts"]  # [Np-1]
    rel_ts_pad = jnp.concatenate(
        [rel_ts, jnp.zeros((1,), rel_ts.dtype)]) if n_steps > 1 \
        else jnp.zeros((n_steps,))

    def body(carry, inp):
        x, t = carry
        noise_i, rel_t = inp
        noise2 = jnp.broadcast_to(noise_i, x.shape)
        x_t = schedule.q_sample(x, t, noise2)
        # pos + neg folded into one 4B-row UNet call (both are no-grad)
        x4 = jnp.concatenate([x_t, x_t], axis=0).astype(dt)
        t4 = jnp.concatenate([t, t], axis=0)
        eps4, _ = unet_apply(unet_params, x4, t4, ctx4, unet_cfg)
        eps_pos, eps_neg = jnp.split(eps4.astype(x.dtype), 2, axis=0)
        # CFG with the uncond context (`unet_teachers.py:153-155`)
        eps = eps_pos * s - eps_neg * (s - 1.0)
        x_new = schedule.predict_start_from_noise(x_t, t, eps)
        tf = t.astype(jnp.float32)
        t_new = ((tf * ub_f - tf * lb_f) * rel_t
                 + tf * lb_f).astype(jnp.int32)
        return (x_new, t_new), None

    (x, _), _ = jax.lax.scan(body, (x, t),
                             (rand["prime_noises"][:n_steps], rel_ts_pad))
    x_single, x_comp = jnp.split(jax.lax.stop_gradient(x), 2, axis=0)
    return x_single, x_comp


def _gate4(x: jax.Array) -> jax.Array:
    """stop_gradient on the ss / sc_rep / mc blocks — the batched
    equivalent of `sliced_apply_model(..., enable_grad=False)` on blocks
    0/2/3 (`guided_denoise`, `ddpm.py:1630-1712`)."""
    ss, sc, sr, mc = jnp.split(x, 4, axis=0)
    return jnp.concatenate([
        jax.lax.stop_gradient(ss), sc,
        jax.lax.stop_gradient(sr), jax.lax.stop_gradient(mc)], axis=0)


def comp_distill_denoise(
    unet_params: Params,
    unet_cfg,
    schedule: DiffusionSchedule,
    x_start4: jax.Array,  # [4B, 4, h, w] primed starts [ss, cc, cc, cc]
    ctx4: jax.Array,  # [4B, S, D] ss ‖ sc ‖ sc_rep ‖ cc_mix contexts
    uncond_ctx: jax.Array,  # [1, S, D]
    subj_mask4: jax.Array,  # [4B, S] subject-token positions
    rand: Params,
    attn_lora: Params | None = None,
    ffn_lora: Params | None = None,
    cfg: CompDistillConfig = CompDistillConfig(),
):
    """→ (captured_per_step: list of activation dicts, x_recons: list of
    [4B,…] per-step CFG'd reconstructions, ts: list of [4B], x_inputs:
    list of [4B,…] per-step chain inputs — the reference's `x_starts`,
    consumed by `redenoise_subj_single`).

    Only the SC block (index 1) carries gradients; x_starts chain through
    DETACHED x_recons (`ddpm.py:2080-2086`, old_x_starts_mix_ratio=0)."""
    b4 = x_start4.shape[0]
    b = b4 // 4
    n_steps = cfg.num_denoising_steps
    mix = cfg.mix_sc_mc_attn
    normalize = cfg.normalize_cross_attn and not mix
    use_attn_lora = cfg.use_attn_lora and attn_lora is not None and not mix
    use_ffn_lora = cfg.use_ffn_lora and ffn_lora is not None and not mix

    # attn LoRA on ss/sc/sr, never mc (`ddpm.py:1698-1706`); the ffn gate
    # additionally flips per step
    block_gate = jnp.concatenate(
        [jnp.ones((3 * b,), jnp.float32), jnp.zeros((b,), jnp.float32)])
    # normalization applies to sc/sc_rep only: ss rows are zeroed; cls rows
    # carry no subject tokens so their mask is already zero
    # (`extra_info_ss['normalize_cross_attn'] = False`, `ddpm.py:1641`)
    norm_mask = jnp.concatenate(
        [jnp.zeros_like(subj_mask4[:b]), subj_mask4[b:]], axis=0)

    rt = AttnRuntime(
        capture=True,
        use_attn_lora=use_attn_lora,
        use_ffn_lora=use_ffn_lora,
        ffn_adapter="comp_distill",
        normalize_cross_attn=normalize,
        mix_attn_mats_in_batch=False,
        res_hidden_gradscale=cfg.res_hidden_gradscale,
    )
    # the uncond CFG pass keeps the (step-gated) ffn LoRA on ALL rows but
    # never the attn LoRA (`guided_denoise`, `ddpm.py:1728-1734`:
    # use_attn_lora=False, use_ffn_lora=use_ffn_lora)
    rt_uncond = AttnRuntime(use_ffn_lora=use_ffn_lora,
                            ffn_adapter="comp_distill",
                            res_hidden_gradscale=1.0)

    s = cfg.denoise_cfg_scale
    dt = jnp.dtype(cfg.compute_dtype)
    p = _chain_power(n_steps)
    lb_f, ub_f = 0.5 ** p, 0.7 ** p
    un4 = jnp.broadcast_to(uncond_ctx, (b4, *uncond_ctx.shape[1:])
                           ).astype(dt)
    ctx_h = ctx4.astype(dt)

    # bf16 UNet activations (the reference autocasts UNet calls to fp16,
    # `ddpm.py:4225`) + per-step rematerialization: without remat the
    # 4-block × 4-step backward needs ~34 GB of fp32 HLO temps — over 2×
    # v5e HBM; with checkpoint the backward recomputes each step's forward
    def cond_step(params, a_lora, f_lora, x_t, t, ffn_gate):
        if mix:
            # joint sc+mc attention mixing (`ddpm.py:1664-1684`): ss and sr
            # run plainly, [sc, mc] run as one batch with mixed attn mats
            ss_x, sc_x, sr_x, mc_x = jnp.split(x_t, 4, axis=0)
            ss_c, sc_c, sr_c, mc_c = jnp.split(ctx_h, 4, axis=0)
            t1, t2_, t3, t4 = jnp.split(t, 4, axis=0)
            rt_plain = dataclasses.replace(rt, mix_attn_mats_in_batch=False)
            rt_mix = dataclasses.replace(rt, mix_attn_mats_in_batch=True)
            eps_ss, cap_ss = unet_apply(params, ss_x, t1, ss_c, unet_cfg,
                                        rt=rt_plain)
            eps_sr, cap_sr = unet_apply(params, sr_x, t3, sr_c, unet_cfg,
                                        rt=rt_plain)
            eps_sm, cap_sm = unet_apply(
                params, jnp.concatenate([sc_x, mc_x]),
                jnp.concatenate([t2_, t4]),
                jnp.concatenate([sc_c, mc_c]), unet_cfg, rt=rt_mix)
            eps_sc, eps_mc = jnp.split(eps_sm, 2, axis=0)
            eps = jnp.concatenate([eps_ss, eps_sc, eps_sr, eps_mc], axis=0)

            def join(k_ss, k_sm, k_sr):
                sc_c_, mc_c_ = jnp.split(k_sm, 2, axis=0)
                return jnp.concatenate([k_ss, sc_c_, k_sr, mc_c_], axis=0)

            cap = jax.tree_util.tree_map(join, cap_ss, cap_sm, cap_sr)
            return eps, cap
        gates = block_gate * ffn_gate
        return unet_apply(
            params, x_t, t, ctx_h, unet_cfg, rt=rt,
            attn_lora=a_lora, ffn_lora=f_lora, subj_mask=norm_mask,
            attn_lora_gate=block_gate if use_attn_lora else None,
            ffn_lora_gate=gates if use_ffn_lora else None)

    cond_step = jax.checkpoint(cond_step, static_argnums=())

    # lax.scan over the denoising steps: ONE cond + ONE uncond UNet body
    # in the HLO instead of n_steps copies of each (+ their backward
    # recomputes) — the unrolled graph OOM-killed the relay compile
    # helper (VERDICT r4 #1). Gradients only flow out of each step's
    # stacked outputs (the chain carry is detached), so the scan VJP is
    # equivalent to the unrolled per-step backward.
    rel_ts = rand["den_rel_ts"]  # [n_steps-1, B]
    rel_ts_pad = jnp.concatenate(
        [rel_ts, jnp.zeros((1, b), rel_ts.dtype)], axis=0) \
        if n_steps > 1 else jnp.zeros((n_steps, b))

    def body(carry, inp):
        x, t = carry
        noise_b, rel_t, ffn_gate = inp
        x_in = x
        noise4 = jnp.tile(noise_b, (4, 1, 1, 1))
        x_t = schedule.q_sample(x, t, noise4)
        eps, cap = cond_step(unet_params, attn_lora, ffn_lora,
                             x_t.astype(dt), t, ffn_gate)
        # per-block gradient gating on outputs = sliced enable_grad calls
        eps = _gate4(eps.astype(x.dtype))
        cap = jax.tree_util.tree_map(_gate4, cap)
        # CFG 2.5 against uncond, no grad on the uncond pass (`:1717-1745`)
        eps_un, _ = unet_apply(
            unet_params, x_t.astype(dt), t, un4, unet_cfg, rt=rt_uncond,
            ffn_lora=ffn_lora if use_ffn_lora else None,
            ffn_lora_gate=(jnp.broadcast_to(ffn_gate, (b4,))
                           if use_ffn_lora else None))
        eps_cfg = eps * s - jax.lax.stop_gradient(eps_un.astype(x.dtype)) \
            * (s - 1.0)
        x_recon = schedule.predict_start_from_noise(x_t, t, eps_cfg)
        # chain through the DETACHED recon (`x_recon.detach()`, `:2082`)
        x_next = jax.lax.stop_gradient(x_recon)
        tf = t[:b].astype(jnp.float32)
        et = ((tf * ub_f - tf * lb_f) * rel_t + tf * lb_f).astype(jnp.int32)
        t_next = jnp.tile(et, (4,))
        return (x_next, t_next), (cap, x_recon, t, x_in)

    t0 = jnp.tile(rand["den_t0"], (4,))
    _, (caps_st, recons_st, ts_st, xins_st) = jax.lax.scan(
        body, (x_start4, t0),
        (rand["den_noises"], rel_ts_pad, rand["den_ffn_gates"]))
    # unstack to the per-step list interface the loss assembly consumes
    idx = lambda i: (lambda v: v[i])  # noqa: E731
    captured_steps = [jax.tree_util.tree_map(idx(i), caps_st)
                      for i in range(n_steps)]
    x_recons = [recons_st[i] for i in range(n_steps)]
    ts = [ts_st[i] for i in range(n_steps)]
    x_inputs = [xins_st[i] for i in range(n_steps)]
    return captured_steps, x_recons, ts, x_inputs


def encode_comp_prompts(
    frozen: Params,
    ada_embs: jax.Array,  # [B, K, D]
    batch: Params,
    cfg: TrainConfig,
):
    """Encode the 5-block comp prompt batch [ss ‖ sc ‖ sc_rep ‖ cs ‖ cc]
    (`LatentDiffusion.forward`, `ddpm.py:1400-1530`).

    → dict with per-block contexts (ss/sc/sr/cc), the distributed class
    contexts for the delta loss (cs_dist/cc_dist, `ddpm.py:1466-1474`),
    and the uncond context (`ddpm.py:684-687`). The sc_rep block is
    encoded with FIXED clip-skip weights (randomize_clip_weights=False,
    `ddpm.py:1419-1424`); the other four use the per-iteration weights."""
    ids = batch["prompt_ids"]  # [5B, S]
    splice_map = batch["splice_map"]  # [5B, S]
    b = ada_embs.shape[0]
    table = frozen["text_encoder"]["token_embedding"]
    base = table[ids]
    zeros = jnp.zeros_like(ada_embs)
    ada5 = jnp.concatenate([ada_embs, ada_embs, ada_embs, zeros, zeros], axis=0)
    embs = splice_ada_embeddings(base, ada5, splice_map)
    if batch.get("merge_map") is not None:
        from adaface_tpu.text.embedding_manager import apply_merge_map

        embs = apply_merge_map(embs, batch["merge_map"])

    skip_w = batch.get("clip_skip_weights")
    if skip_w is None:
        skip_w = jnp.asarray(cfg.clip_skip_weights)
    fixed_w = batch.get("clip_skip_weights_fixed")
    if fixed_w is None:
        fixed_w = jnp.asarray(cfg.clip_skip_weights)

    def rows(x, blocks):
        return jnp.concatenate([x[i * b:(i + 1) * b] for i in blocks], axis=0)

    # blocks ss/sc/cs/cc with the per-iteration (Dirichlet) weights
    ctx4 = clip_mod.text_encode(
        frozen["text_encoder"], rows(ids, (0, 1, 3, 4)), cfg.clip_text,
        input_embs=rows(embs, (0, 1, 3, 4)),
        skip_weights=skip_w)["last_hidden_state"]
    ss, sc, cs, cc = jnp.split(ctx4, 4, axis=0)
    # sc_rep with fixed weights (`randomize_clip_weights=False`, `:1422`)
    sr = clip_mod.text_encode(
        frozen["text_encoder"], ids[2 * b:3 * b], cfg.clip_text,
        input_embs=embs[2 * b:3 * b],
        skip_weights=fixed_w)["last_hidden_state"]

    # uncond context: CLIP("") with fixed weights (`ddpm.py:684-687`)
    uncond = clip_mod.text_encode(
        frozen["text_encoder"], batch["uncond_ids"][:1], cfg.clip_text,
        skip_weights=fixed_w)["last_hidden_state"]

    # distributed class contexts for the delta loss, indexed by the
    # subject-single block's placeholder positions
    # (`distribute_embedding_to_M_tokens_by_dict`, `ddpm.py:1466-1474`)
    ss_map = splice_map[:b]
    cs_dist = distribute_embedding_to_M_tokens(cs, ss_map, uncond)
    cc_dist = distribute_embedding_to_M_tokens(cc, ss_map, uncond)
    return {"ss": ss, "sc": sc, "sr": sr, "cs": cs, "cc": cc,
            "cs_dist": cs_dist, "cc_dist": cc_dist, "uncond": uncond}


def comp_distill_loss_fn(
    trainable: Params,
    frozen: Params,
    batch: Params,
    schedule: DiffusionSchedule,
    cfg: TrainConfig,
    rng: jax.Array,
    comp_cfg: CompDistillConfig = CompDistillConfig(),
    detector=None,  # HostFaceDetector for detection-on-recons
    stage: str = "full",  # full | collect1 | collect2 (3-phase, see below)
):
    """Full comp-distill iteration loss.

    `stage` implements the callback-less three-phase choreography for
    backends rejecting host callbacks (the axon relay): "collect1" returns
    the decoded SS/SC/MC pixels in the metrics ("comp_px"), "collect2"
    consumes round-1 detections from `batch["comp_face_dets"]` and returns
    the redenoised-SS pixels ("ss2_px"), and "full" with both detection
    sets in the batch replaces every callback
    (`make_three_phase_comp_step`).

    batch: img_prompt_embs [B,K,D]; prompt_ids/splice_map/prompt_emb_mask/
    prompt_pad_mask [5B,…] ([ss ‖ sc ‖ sc_rep ‖ cs ‖ cc] blocks);
    uncond_ids [1,S]; ss_face_bboxes / sc_face_bboxes [B,4] (latent
    coords, host-detected on decoded recons); sc_fg_mask_percent scalar;
    noise [B,4,h,w]; optional comp_rand (pre-sampled randomness).
    """
    k_rand = rng
    # comp iterations use the first instance's embeddings for the whole
    # batch (`embedding_manager.py:316-320`)
    ada = compute_ada_embs(trainable, frozen,
                           batch["img_prompt_embs"][:1], cfg)
    b = batch["img_prompt_embs"].shape[0]
    ada = jnp.tile(ada, (b, 1, 1))

    ctx = encode_comp_prompts(frozen, ada, batch, cfg)

    # denoise-context mixing (`ddpm.py:1512`): 60% CLASS comp embedding
    r = comp_cfg.cls_subj_mix_ratio
    cc_mix = ctx["sc"] * (1.0 - r) + ctx["cc"] * r
    ctx4_run = jnp.concatenate([ctx["ss"], ctx["sc"], ctx["sr"], cc_mix],
                               axis=0)
    # priming mixes with the stronger 0.5 + r/2 = 0.8 (`ddpm.py:2398`)
    r_prime = 0.5 + r / 2.0
    cc_mix_prime = ctx["sc"] * (1.0 - r_prime) + ctx["cc"] * r_prime

    rand = batch.get("comp_rand")
    if rand is None:
        rand = sample_comp_rand(k_rand, batch["noise"], schedule, comp_cfg)

    # optional fg-seeded start (`ldm/util.py:1599-1677`, opt-in): replaces
    # the fresh priming noise; priming's first q_sample at t0∈[0.7,0.9]·T
    # renoises it while preserving the subject layout.
    if "comp_x_base" in batch:
        rand = dict(rand, prime_x0=batch["comp_x_base"])

    x_ss, x_cc = prime_comp_x_start(
        frozen["unet"], cfg.unet, schedule, ctx["ss"], cc_mix_prime,
        ctx["uncond"], rand, comp_cfg)
    # sc/sc_rep/mc share the comp primed start (`ddpm.py:2405-2410`)
    x4 = jnp.concatenate([x_ss, x_cc, x_cc, x_cc], axis=0)

    # denoise-batch 4-block masks: [ss, sc, sc_rep, cc] rows of the
    # 5-block plan (`prompt_emb_mask_4b`, `ddpm.py:1519-1526`)
    def rows4(x):
        return jnp.concatenate(
            [x[:3 * b], x[4 * b:5 * b]], axis=0)

    splice4 = rows4(batch["splice_map"])
    subj_mask4 = (splice4 >= 0).astype(jnp.float32)
    captured_steps, x_recons, ts, x_inputs = comp_distill_denoise(
        frozen["unet"], cfg.unet, schedule, x4, ctx4_run, ctx["uncond"],
        subj_mask4, rand,
        attn_lora=trainable.get("attn_lora"),
        ffn_lora=trainable.get("ffn_lora"),
        cfg=comp_cfg,
    )

    n_steps = len(captured_steps)
    subj_mask_1b = subj_mask4[:b]
    loss = jnp.float32(0.0)
    metrics: Params = {}

    # ---- identity-loss family on decoded recons (`ddpm.py:3225-3464`) ----
    have_face = ("arcface" in frozen and "vae" in frozen
                 and (detector is not None or "comp_face_dets" in batch
                      or stage != "full")
                 and comp_cfg.arcface_align_loss_weight > 0
                 and "ref_images" in batch)
    if have_face:
        # module-level import (not here): this function runs under jit
        # tracing, and importing a module inside a trace runs its
        # module-level array constructors under that trace (the
        # RGB_TO_GRAY leak, 2026-08-21)
        batch_f = batch
        if "redenoise_rand" not in batch:
            k1, k2 = jax.random.split(jax.random.fold_in(k_rand, 99))
            sh = (n_steps, b, *batch["noise"].shape[1:])
            batch_f = dict(batch,
                           redenoise_rand={
                               "x": jax.random.normal(k1, sh),
                               "n": jax.random.normal(k2, sh)})
        id_loss, aux, id_metrics = comp_identity_losses(
            frozen, detector, x_recons, x_inputs, rand["den_noises"], ts,
            captured_steps, ctx["ss"], ctx["uncond"], subj_mask_1b,
            batch_f, trainable.get("attn_lora"), trainable.get("ffn_lora"),
            cfg.unet, schedule, comp_cfg, stage=stage)
        if stage != "full":
            # collect phases: the pixel outputs ride in the metrics slot
            return jnp.float32(0.0), aux
        loss = loss + id_loss
        metrics.update(id_metrics)
        captured_steps = aux["captured_steps"]
        sc_fg_pct = aux["sc_fg_mask_percent"]
        ss_bboxes_per_step = aux["ss_bboxes_per_step"]
        sc_bboxes = aux["sc_fg_face_bboxes"]
        fg_bg_gates = aux["fg_bg_gates"]
        ct_gates = aux["ct_gates"]
        shrink = aux["shrink_ratio"]
        do_supp = aux["do_sc_fg_faces_suppress"]
    elif stage != "full":
        # collect phase with the identity family disabled (zero weight /
        # no ref_images in the batch): nothing to detect — return empty
        # pixel outputs so make_three_phase_comp_step's run() skips
        # detection and the train phase takes the no-face fallback below
        z = jnp.zeros((0,), jnp.float32)
        return jnp.float32(0.0), {"comp_px": {"ssmc": z, "sc": z},
                                  "ss2_px": z}
    else:
        # fallback (no face towers wired): pre-denoise bboxes/percent from
        # the batch, all steps active, classic mb-suppress on the fg mask
        sc_fg_pct = jnp.asarray(batch.get("sc_fg_mask_percent", 1.0))
        ss_bboxes_per_step = [batch["ss_face_bboxes"]] * n_steps
        sc_bboxes = batch["sc_face_bboxes"]
        fg_bg_gates = jnp.ones((n_steps,))
        ct_gates = jnp.zeros((n_steps,)).at[n_steps - 2].set(1.0) \
            if n_steps > 1 else jnp.zeros((n_steps,))
        shrink = 1.0
        do_supp = 0.0
        sc_attn = {k: jnp.split(v, 4)[1]
                   for k, v in captured_steps[-1]["attn"].items()}
        loss_mb = calc_subj_masked_bg_suppress_loss(
            sc_attn, subj_mask_1b, batch.get("fg_mask"))
        loss = loss + comp_cfg.mb_suppress_weight * loss_mb
        metrics["loss_mb_suppress"] = loss_mb

    # ---- per-step losses over ALL denoising steps (`ddpm.py:3466-3514`) --
    emb_mask4 = rows4(batch["prompt_emb_mask"])
    pad_mask4 = rows4(batch["prompt_pad_mask"])
    flow_fn = None
    if comp_cfg.use_face_flow and "flow" in frozen:
        from adaface_tpu.models.gma import make_latent_flow_fn

        flow_fn = make_latent_flow_fn(frozen["flow"]["gma"])

    rep_sums = {k: jnp.float32(0.0) for k in (
        "subj_attn", "subj_k", "nonsubj_k", "subj_v", "nonsubj_v")}
    fg_bg_steps = []
    ct_steps = []
    for s in range(n_steps):
        rep_s = calc_sc_rep_attn_distill_loss(
            captured_steps[s], subj_mask_1b, emb_mask4, pad_mask4,
            sc_fg_pct, fg_thres=comp_cfg.rep_dist_fg_bounds[0])
        for k in rep_sums:
            rep_sums[k] = rep_sums[k] + rep_s[k] / n_steps
        loss_fg_bg_s, em_metrics = calc_comp_subj_bg_preserve_loss(
            captured_steps[s], ss_bboxes_per_step[s], sc_bboxes,
            flow_fn=flow_fn,
            small_motion_ignore_thres=comp_cfg.small_motion_ignore_thres,
            do_sc_fg_faces_suppress=do_supp,
            sc_face_shrink_ratio=shrink)
        fg_bg_steps.append(loss_fg_bg_s)
        if s < n_steps - 1:
            ct_steps.append(calc_subj_attn_cross_t_diff_loss(
                captured_steps[s], captured_steps[s + 1], subj_mask_1b))

    loss_fg_bg = (jnp.stack(fg_bg_steps) * fg_bg_gates).sum() \
        / (fg_bg_gates.sum() + 1e-6)
    loss = loss + comp_cfg.fg_bg_preserve_weight * loss_fg_bg
    metrics["loss_comp_fg_bg_preserve"] = loss_fg_bg

    if ct_steps:
        ctg = ct_gates[:len(ct_steps)]
        loss_cross_t = (jnp.stack(ct_steps) * ctg).sum() / (ctg.sum() + 1e-6)
    else:
        loss_cross_t = jnp.float32(0.0)
    # monitor-only in the reference ("* 0 => DISABLED", `ddpm.py:3553-3556`)
    loss = loss + comp_cfg.cross_t_diff_weight * loss_cross_t
    metrics["loss_cross_t_diff"] = loss_cross_t

    # ---- rep-distill assembly (`ddpm.py:3556-3590`) ----
    from adaface_tpu.train.comp_losses import calc_dyn_loss_scale

    bounds = comp_cfg.rep_dist_fg_bounds
    fg_scale = calc_dyn_loss_scale(
        sc_fg_pct, (bounds[1], 0.5), (bounds[2], 2.0),
        valid_scale_range=(0.05, 2.0)) * (sc_fg_pct > 0)
    loss_rep = ((rep_sums["subj_attn"] + rep_sums["subj_k"]
                 + rep_sums["subj_v"]) * 2.0
                + rep_sums["nonsubj_k"] * 5.0
                + rep_sums["nonsubj_v"] * 2.0) * fg_scale
    loss = loss + comp_cfg.rep_distill_weight * loss_rep
    metrics["loss_rep_distill"] = loss_rep

    # attn-norm: dead code in the reference (never called) — monitor only
    loss_attn_norm = calc_attn_norm_loss(
        {k: jnp.concatenate([jnp.split(v, 4)[1], jnp.split(v, 4)[3]], axis=0)
         for k, v in captured_steps[-1]["attnscore"].items()},
        subj_mask_1b)
    loss = loss + comp_cfg.attn_norm_weight * loss_attn_norm
    metrics["loss_attn_norm"] = loss_attn_norm

    # prompt-delta loss on [ss, sc, cs_dist, cc_dist] with the ORIGINAL
    # masks (`prompt_emb_4b_orig_dist` + `prompt_emb_mask_4b_orig`,
    # `ddpm.py:2286-2293`)
    ctx4_delta = jnp.concatenate(
        [ctx["ss"], ctx["sc"], ctx["cs_dist"], ctx["cc_dist"]], axis=0)
    emb_mask_orig = jnp.concatenate(
        [batch["prompt_emb_mask"][:2 * b],
         batch["prompt_emb_mask"][3 * b:5 * b]], axis=0)
    loss_delta = calc_prompt_emb_delta_loss(ctx4_delta, emb_mask_orig)
    loss = loss + comp_cfg.prompt_emb_delta_weight * loss_delta
    metrics["loss_prompt_emb_delta"] = loss_delta
    metrics["loss"] = loss
    return loss, metrics


# ---------------------------------------------------------------------------
# three-phase detection choreography (callback-less backends)
# ---------------------------------------------------------------------------


def comp_detections_to_batch(d_ssmc, d_sc, d_ss2, s_steps: int, b: int,
                             max_bg: int = 2) -> Params:
    """Host FaceDetections → the `comp_face_dets` batch entry.

    d_ssmc: detections over the [S·B + B] flattened SS-all-steps ‖ MC-last
    pixels; d_sc: over the [S·B] flattened per-step SC pixels; d_ss2
    (optional, None before phase 2): over the [S·B] redenoised SS pixels.
    """
    import numpy as np

    out = {
        "ssmc_fg": jnp.asarray(np.asarray(d_ssmc.fg_bboxes)),
        "ssmc_det": jnp.asarray(np.asarray(d_ssmc.detected)),
        "ssmc_conf": jnp.asarray(np.asarray(d_ssmc.confidences)),
        "sc_fg": jnp.asarray(
            np.asarray(d_sc.fg_bboxes).reshape(s_steps, b, 4)),
        "sc_det": jnp.asarray(np.asarray(d_sc.detected).reshape(s_steps, b)),
        "sc_bgb": jnp.asarray(
            np.asarray(d_sc.bg_bboxes)[:, :max_bg].reshape(
                s_steps, b, max_bg, 4)),
        "sc_bgv": jnp.asarray(
            np.asarray(d_sc.bg_valid)[:, :max_bg].reshape(
                s_steps, b, max_bg)),
    }
    if d_ss2 is not None:
        out["ss2_fg"] = jnp.asarray(np.asarray(d_ss2.fg_bboxes))
        out["ss2_det"] = jnp.asarray(np.asarray(d_ss2.detected))
        out["ss2_conf"] = jnp.asarray(np.asarray(d_ss2.confidences))
    return out


def make_three_phase_comp_step(comp_cfg: CompDistillConfig, detector,
                               optimizer, frozen: Params, schedule,
                               cfg: TrainConfig, progress=None):
    """Comp-distill step for backends WITHOUT host-callback support (the
    axon PJRT relay rejects `pure_callback`, probed by
    `backend_supports_callbacks`). The comp identity family has a
    detection→redenoise→detection dependency chain, so unlike recon's
    two phases it needs three:

    1. collect1 (jit, no grad): denoise → decoded SS/SC/MC pixels;
    2. host detection round 1;
    3. collect2 (jit, no grad): SC-crop-mixed SS re-denoise using round-1
       bboxes → decoded redenoised-SS pixels;
    4. host detection round 2;
    5. train (jit, fwd+bwd): the full loss graph consuming both
       detection sets as batch data.

    The denoise trajectories are recomputed identically in each phase
    from the same rng (all randomness is pre-sampled or rng-derived), so
    the math matches the single-graph callback mode —
    `tests/test_comp_three_phase.py` asserts equality.
    """
    from adaface_tpu.train.train_step import (make_frozen_caller,
                                              make_train_step)

    collect1 = make_frozen_caller(
        lambda frozen_, params, batch, rng: comp_distill_loss_fn(
            params, frozen_, batch, schedule, cfg, rng, comp_cfg=comp_cfg,
            detector=None, stage="collect1")[1]["comp_px"], frozen)
    collect2 = make_frozen_caller(
        lambda frozen_, params, batch, rng: comp_distill_loss_fn(
            params, frozen_, batch, schedule, cfg, rng, comp_cfg=comp_cfg,
            detector=None, stage="collect2")[1]["ss2_px"], frozen)
    loss_fn = lambda *a: comp_distill_loss_fn(  # noqa: E731
        *a, comp_cfg=comp_cfg, detector=None)
    step = make_train_step(loss_fn, optimizer, frozen, schedule, cfg,
                           donate=False)
    max_bg = comp_cfg.max_bg_faces

    note = progress if progress is not None else (lambda msg: None)

    def run(state, batch, rng):
        import numpy as np

        px = collect1(state.params, batch, rng)
        ssmc = np.asarray(px["ssmc"])
        if ssmc.size == 0:
            # identity family disabled for this batch (no ref_images /
            # zero weight): no detection rounds; the train graph takes
            # its no-face fallback path
            return step(state, batch, rng)
        note("collect1 done (SS/SC/MC denoise decoded)")
        sc = np.asarray(px["sc"])  # [S, B, ps, ps, 3] uint8
        s_steps, b = sc.shape[0], sc.shape[1]
        # detection runs on downsized u8 frames (collect_px_size); the
        # train graph consumes bboxes in full-decode pixel space
        full_px = batch["x_start"].shape[-1] * (
            comp_cfg.vae_cfg.spatial_scale
            if comp_cfg.vae_cfg is not None else 8)
        scale = full_px / ssmc.shape[1]

        def rescale(d):
            if scale != 1.0:
                d.fg_bboxes = d.fg_bboxes * scale
                d.bg_bboxes = d.bg_bboxes * scale
            return d

        def detect(frames):
            # min_size is a FULL-RES pixel threshold; detection runs on
            # collect_px_size-downsized frames, so shrink it by the same
            # factor — otherwise small faces that callback mode keeps
            # would be silently dropped here.
            orig = getattr(detector, "min_size", None)
            if orig is not None and scale != 1.0:
                detector.min_size = max(1, int(round(orig / scale)))
            try:
                return detector(frames)
            finally:
                if orig is not None:
                    detector.min_size = orig

        d_ssmc = rescale(detect(ssmc))
        d_sc = rescale(detect(sc.reshape(s_steps * b, *sc.shape[2:])))
        batch2 = dict(batch, comp_face_dets=comp_detections_to_batch(
            d_ssmc, d_sc, None, s_steps, b, max_bg))
        ss2 = np.asarray(collect2(state.params, batch2, rng))
        note("collect2 done (SS re-denoise decoded)")
        d_ss2 = rescale(detect(ss2))
        batch3 = dict(batch, comp_face_dets=comp_detections_to_batch(
            d_ssmc, d_sc, d_ss2, s_steps, b, max_bg))
        return step(state, batch3, rng)

    return run
