"""Normal-recon iteration with the ArcFace identity loss (the live path).

Reference-exact rebuild of `calc_normal_recon_loss`
(`ldm/models/diffusion/ddpm.py:2593-2883`) + `recon_multistep_denoise`
(`ddpm.py:1753-1917`) as ONE jitted loss graph:

1. multi-step denoise (default 2 steps; +4 priming steps when
   `on_pure_noise`, p=0.4 per iteration) with CFG 2 against the uncond
   context; on images every step restarts from the input latents
   (`ddpm.py:1824-1827`), on pure noise the steps chain WITH gradient
   (`ddpm.py:1815-1823`); each step also runs a no-grad cls-conditioned
   denoise (cls_single_emb, UNDISTRIBUTED — `ddpm.py:1545,2341`) whose
   prediction anchors the background (`ddpm.py:2583-2592`).
2. per step: VAE-decode the recon WITH gradient
   (`decode_first_stage_with_grad`, `ddpm.py:2516`), detect faces on the
   host via `jax.pure_callback` (train/face_detect.py — SURVEY §7 "hard
   part 2"), then `loss_arcface_align_recon` / fg-suppress / bg-suppress
   with the MaskedGrad crop machinery (train/face_losses.py ≡
   `arcface_wrapper.py:171-230`), the ≤0.8 align-loss keep threshold
   (`recon_face_align_loss_thres`, `ddpm.py:2726`), 0.1-weighted
   undetected instances, and the detected-face-bbox ∧ fg mask for the
   recon loss (`ddpm.py:2736-2768`).
3. aggregate exactly as the reference: recon / recon_cls scaled by the
   per-step 0.1 no-face discount, mb-suppress ×0.2, arcface ×0.01 (×4 on
   pure noise), bg-faces ×2 (`ddpm.py:2799-2881`).

The adversarial ArcFace grad attack between steps (`ddpm.py:1879-1912`,
`calc_arcface_adv_grad:2536-2581`) is config-gated
(p_do_adv_attack_when_recon_on_images defaults to 0 in the reference,
`ddpm.py:123`).

Data-dependent gates (face detected? loss under threshold?) become {0,1}
weights in the loss arithmetic — one static graph per (on_pure_noise,
do_adv_attack) combination; everything else (attn-LoRA 50% gate, ffn
adapter, timestep draws) rides in as batch data.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from adaface_tpu.models.unet import AttnRuntime, unet_apply
from adaface_tpu.models.vae import vae_decode
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.train.face_detect import (
    HostFaceDetector,
    bbox_latent_mask,
    detect_faces_in_graph,
    map_bboxes_to_latent,
)
from adaface_tpu.train.face_losses import (
    calc_arcface_align_loss,
    calc_bg_faces_suppress_loss,
)
from adaface_tpu.train.losses import (
    calc_prompt_emb_delta_loss,
    calc_recon_and_suppress_losses,
)
from adaface_tpu.train.recon_multistep import calc_arcface_adv_grad
from adaface_tpu.train.train_step import (
    TrainConfig,
    _encode_prompts_with_ada,
    compute_ada_embs,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ReconStepConfig:
    """Static knobs of the recon graph (reference ctor defaults,
    `ddpm.py:86-140`)."""

    num_denoising_steps: int = 2  # num_recon_denoising_steps (`:106`)
    num_priming_steps: int = 4  # only applied when on_pure_noise (`:2313`)
    on_pure_noise: bool = False
    cfg_scale: float = 2.0  # `ddpm.py:2621`
    arcface_align_loss_weight: float = 0.01  # `:127`
    recon_face_align_loss_thres: float = 0.8  # `:96`
    recon_subj_mb_suppress_loss_weight: float = 0.2  # `:86`
    recon_bg_pixel_weight: float = 0.025  # `:125`
    recon_cls_weight: float = 1.0  # added unscaled (`:2875`)
    # adversarial attack (`:1879-1912`); p defaults to 0 in the reference
    do_adv_attack: bool = False
    adv_bs: int = 2
    recon_adv_mod_mag_range: tuple[float, float] = (0.001, 0.003)
    ffn_adapter: str = "recon_loss"
    max_bg_faces: int = 2
    # detection-image size of the collect phase: the host detector only
    # needs ~256² (SCRFD/cascade resize internally anyway), so the
    # collect pass downsamples the decoded recons on-device before the
    # host readback — 4× less relay traffic at 512² decode. 0 = full res.
    # Only the DETECTION runs downscaled; the ArcFace identity crop in
    # the train phase always sees the full-res in-graph decode.
    collect_px_size: int = 256
    # UNet compute dtype — bf16 on TPU (the reference autocasts to fp16,
    # `ddpm.py:4225`); golden tests set float32
    compute_dtype: str = "bfloat16"
    # VAE config for the in-graph decodes (tests use tiny towers)
    vae_cfg: Any = None

    @property
    def total_steps(self) -> int:
        return self.num_denoising_steps + (
            self.num_priming_steps if self.on_pure_noise else 0)


def sample_recon_rand(
    rng: jax.Array,
    x_start: jax.Array,  # [B, 4, h, w]
    schedule: DiffusionSchedule,
    cfg: ReconStepConfig,
) -> Params:
    """Materialize the iteration's random draws in reference order so
    golden tests can inject the oracle's recorded values."""
    b = x_start.shape[0]
    t_total = schedule.num_timesteps
    s = cfg.total_steps
    ks = jax.random.split(rng, 6)
    lo, hi = (0.7, 0.9) if cfg.on_pure_noise else (0.5, 0.8)  # `:2605-2613`
    return {
        "t0": jax.random.randint(ks[0], (b,), int(t_total * lo),
                                 int(t_total * hi)),
        # noises[0] is p_losses' noise (`:2278`); later steps draw fresh
        "noises": jax.random.normal(ks[1], (s, *x_start.shape),
                                    x_start.dtype),
        "rel_ts": jax.random.uniform(ks[2], (max(s - 1, 0), b)),
        "x_start0": jax.random.normal(ks[3], x_start.shape, x_start.dtype),
        "adv_uniform": jax.random.uniform(ks[4], ()),
        "adv_dropout_key": ks[5],
    }


def _next_t(t: jax.Array, rel: jax.Array, total_steps: int) -> jax.Array:
    """Power-law earlier-timestep chain (`ddpm.py:1853-1869`)."""
    import numpy as np

    p = float(np.power(max(total_steps - 1, 1), -0.3))
    tf = t.astype(jnp.float32)
    t_lb, t_ub = tf * (0.5 ** p), tf * (0.7 ** p)
    return ((t_ub - t_lb) * rel + t_lb).astype(jnp.int32)


def recon_loss_fn_v2(
    trainable: Params,
    frozen: Params,
    batch: Params,
    schedule: DiffusionSchedule,
    cfg: TrainConfig,
    rng: jax.Array,
    rcfg: ReconStepConfig = ReconStepConfig(),
    detector: HostFaceDetector | None = None,
    collect_mode: bool = False,
):
    """Full normal-recon iteration loss (`p_losses` recon branch,
    `ddpm.py:2296-2353` → `calc_normal_recon_loss`).

    batch: x_start [B,4,h,w]; img_prompt_embs [B,K,D]; prompt_ids/
    splice_map/prompt_emb_mask [4B,…]; uncond_ids [1,S]; img_mask/fg_mask
    [B,1,h,w]; ref_images [B,3,H,W] input pixels (≡ decode(x_start),
    `ddpm.py:2514`); ref_face_bboxes [B,4] + ref_face_detected [B]
    host-detected on the inputs; recon_attn_lora_gate [] ∈ {0,1};
    optional recon_rand (pre-sampled randomness).

    Detection choreography (SURVEY §7 "hard part 2") has two modes:
    - in-graph `pure_callback` (default) — ONE jitted graph; used on
      backends with host-callback support (CPU mesh, standard PJRT);
    - two-phase — some PJRT relays (axon) reject host callbacks, so
      `collect_mode=True` runs the identical denoise without gradients
      and returns the decoded recons in the metrics ("recon_px"
      [S_active, B, 3, H, W]); the host detects on them and re-invokes
      the loss with `batch["recon_face_dets"]` = {fg [S,B,4], det [S,B],
      conf [S,B], bgb [S,B,Nbg,4], bgv [S,B,Nbg]}, which replaces the
      callback. The denoise trajectory is detection-independent, so both
      phases produce bitwise-identical recons from the same rng.
    """
    ada = compute_ada_embs(trainable, frozen, batch["img_prompt_embs"], cfg)
    if cfg.training_perturb_prob > 0:
        from adaface_tpu.utils.tensor import anneal_perturb_embedding

        rng, k_pert = jax.random.split(rng)
        ada = anneal_perturb_embedding(
            k_pert, ada, 0.0, cfg.training_perturb_std_range, None,
            cfg.training_perturb_prob)

    ctx4, extras = _encode_prompts_with_ada(frozen, ada, batch, cfg,
                                            return_extras=True)
    b = batch["x_start"].shape[0]
    ctx_subj = ctx4[:b]
    # the recon cls denoise uses the UNDISTRIBUTED cls-single embedding
    # (`extra_info['cls_single_emb']`, `ddpm.py:1545,2341`)
    ctx_cls = extras.get("cs_raw", ctx4[2 * b:3 * b])
    uncond = extras.get("uncond")
    if uncond is None:
        uncond = jnp.zeros_like(ctx_subj[:1])
    uncond_b = jnp.broadcast_to(uncond[:1], ctx_subj.shape)

    rand = batch.get("recon_rand")
    if rand is None:
        rng, k_rand = jax.random.split(rng)
        rand = sample_recon_rand(k_rand, batch["x_start"], schedule, rcfg)

    on_noise = rcfg.on_pure_noise
    n_prime = rcfg.num_priming_steps if on_noise else 0
    s_total = rcfg.total_steps
    x_start_in = batch["x_start"]
    x0 = rand["x_start0"] if on_noise else x_start_in
    img_mask = None if on_noise else batch.get("img_mask")
    fg_mask = (jnp.ones_like(batch["fg_mask"]) if on_noise
               else batch["fg_mask"])
    subj_mask = (batch["splice_map"][:b] >= 0).astype(jnp.float32)
    dt = jnp.dtype(rcfg.compute_dtype)
    hw = x_start_in.shape[-1]

    have_arcface = ("arcface" in frozen and "vae" in frozen
                    and rcfg.arcface_align_loss_weight > 0
                    and (detector is not None
                         or "recon_face_dets" in batch))
    if collect_mode:
        have_arcface = False
    # attn-LoRA 50% gate rides in as data (off on pure noise, `:2307-2317`)
    attn_gate = batch.get("recon_attn_lora_gate", jnp.float32(0.0))
    attn_gate = jnp.broadcast_to(jnp.asarray(attn_gate, jnp.float32), (b,))
    use_attn_lora = "attn_lora" in trainable and not on_noise
    use_ffn_lora = False  # recon_uses_ffn_lora = False (`ddpm.py:129`)

    rt_grad = AttnRuntime(
        capture=True,
        use_attn_lora=use_attn_lora,
        use_ffn_lora=use_ffn_lora,
        ffn_adapter=rcfg.ffn_adapter,
    )
    rt_nograd = AttnRuntime(use_attn_lora=use_attn_lora,
                            use_ffn_lora=use_ffn_lora,
                            ffn_adapter=rcfg.ffn_adapter)
    unet_params = trainable.get("unet", frozen["unet"])
    a_lora = trainable.get("attn_lora")

    def denoise_nograd(x_t, t, ctx, gate, mask):
        eps, _ = unet_apply(
            jax.lax.stop_gradient(unet_params), x_t.astype(dt), t,
            jax.lax.stop_gradient(ctx).astype(dt), cfg.unet, rt=rt_nograd,
            img_mask=mask,
            attn_lora=a_lora, attn_lora_gate=gate if use_attn_lora else None)
        return jax.lax.stop_gradient(eps.astype(x_t.dtype))

    # per-step accumulators (stacked after the static loop)
    align_contribs, align_keeps = [], []
    stat_contribs, stat_gates = [], []
    bg_contribs, bg_gates = [], []
    recon_steps, recon_cls_steps, scale_steps, mb_steps = [], [], [], []
    pred_l2s = []
    det_fracs = []
    collected_px = []
    collected_cls, collected_un = [], []
    # phase-A predictions riding in as batch data: the cls/uncond
    # anchors are consumed under stop_gradient (`ddpm.py:2341,2583`), so
    # the train phase can take phase A's no-grad predictions verbatim
    # instead of recomputing them — 2 of its 3 per-step UNet forwards.
    # Phase A runs with the same params (no update in between), so the
    # values are the ones this graph would compute.
    phase_a = batch.get("recon_phase_a")
    n_active = 0  # active (non-priming) step counter

    x = x0
    t = rand["t0"]
    primed = None
    start_i = 0
    if phase_a is not None and n_prime > 0 and "x_primed" in phase_a:
        # the priming chain is entirely no-grad (`:1783-1789`), so the
        # train phase resumes from phase A's post-priming state instead
        # of recomputing 2×n_prime UNet forwards
        x = jax.lax.stop_gradient(phase_a["x_primed"])
        t = phase_a["t_primed"]
        start_i = n_prime
    noise_next_adj = None  # adv-attacked noise for the next step
    for i in range(start_i, s_total):
        on_priming = i < n_prime
        if collect_mode and on_noise and i == n_prime:
            primed = (x, t)
        noise_i = rand["noises"][i] if noise_next_adj is None \
            else noise_next_adj
        noise_next_adj = None
        x_t = schedule.q_sample(x, t, noise_i)

        if on_priming:
            # priming alternates cls/subj contexts, no grad (`:1783-1789`)
            ctx_p = ctx_cls if i % 2 == 0 else ctx_subj
            x2 = jnp.concatenate([x_t, x_t], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            c2 = jnp.concatenate([ctx_p, uncond_b], axis=0)
            g2 = jnp.concatenate([attn_gate, jnp.zeros_like(attn_gate)])
            eps2 = denoise_nograd(x2, t2, c2, g2, None)
            eps_p, eps_un = jnp.split(eps2, 2, axis=0)
            eps_cfg = eps_p * rcfg.cfg_scale - eps_un * (rcfg.cfg_scale - 1)
            x = schedule.predict_start_from_noise(x_t, t, eps_cfg)
            if i < s_total - 1:
                t = _next_t(t, rand["rel_ts"][i], s_total)
            continue

        # ---- subject-conditioned denoise (gradient + capture) ----
        if collect_mode:
            # ONE batched no-grad call [subj, cls, uncond]; the cls and
            # uncond predictions are collected for the train phase
            x3 = jnp.concatenate([x_t] * 3, axis=0)
            t3 = jnp.concatenate([t] * 3, axis=0)
            c3 = jnp.concatenate([ctx_subj, ctx_cls, uncond_b], axis=0)
            g3 = jnp.concatenate([attn_gate, attn_gate,
                                  jnp.zeros_like(attn_gate)])
            m3 = (jnp.concatenate([img_mask, img_mask,
                                   jnp.ones_like(img_mask)], axis=0)
                  if img_mask is not None else None)
            eps3 = denoise_nograd(x3, t3, c3, g3, m3)
            eps_subj, eps_cls, eps_un = jnp.split(eps3, 3, axis=0)
            collected_cls.append(eps_cls)
            collected_un.append(eps_un)
            cap = {}
        else:
            eps_subj, cap = unet_apply(
                unet_params, x_t.astype(dt), t, ctx_subj.astype(dt),
                cfg.unet, rt=rt_grad, img_mask=img_mask,
                subj_mask=subj_mask, attn_lora=a_lora,
                attn_lora_gate=attn_gate if use_attn_lora else None)
            eps_subj = eps_subj.astype(x.dtype)
            if phase_a is not None:
                # phase A already computed these no-grad anchors
                eps_cls = jax.lax.stop_gradient(phase_a["eps_cls"][n_active])
                eps_un = jax.lax.stop_gradient(phase_a["eps_un"][n_active])
            else:
                # ---- cls + uncond in one no-grad batched call ----
                x2 = jnp.concatenate([x_t, x_t], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                c2 = jnp.concatenate([ctx_cls, uncond_b], axis=0)
                g2 = jnp.concatenate([attn_gate, jnp.zeros_like(attn_gate)])
                m2 = (jnp.concatenate([img_mask, jnp.ones_like(img_mask)],
                                      axis=0) if img_mask is not None
                      else None)
                eps2 = denoise_nograd(x2, t2, c2, g2, m2)
                eps_cls, eps_un = jnp.split(eps2, 2, axis=0)
        n_active += 1

        do_cfg = rcfg.cfg_scale > 1 and (s_total > 1 or on_noise)
        if do_cfg:
            s_ = rcfg.cfg_scale
            eps_subj_cfg = eps_subj * s_ - eps_un * (s_ - 1.0)
            eps_cls_cfg = eps_cls * s_ - eps_un * (s_ - 1.0)
        else:
            eps_subj_cfg, eps_cls_cfg = eps_subj, eps_cls
        x_recon = schedule.predict_start_from_noise(x_t, t, eps_subj_cfg)

        pred_l2s.append((eps_subj_cfg.astype(jnp.float32) ** 2).mean())

        # ---- identity losses on the decoded recon (`:2700-2789`) ----
        # loss decodes run in the step's compute dtype (the reference
        # autocasts this region to fp16, `ddpm.py:4225`); losses see f32
        if collect_mode and "vae" in frozen:
            from adaface_tpu.models.vae import SD_VAE

            px_full = jax.lax.stop_gradient(vae_decode(
                frozen["vae"], x_recon.astype(dt),
                rcfg.vae_cfg or SD_VAE).astype(jnp.float32))
            # downsample + uint8-NHWC on-device for the host detector
            # readback (the ArcFace crop in the train phase decodes
            # full-res in-graph): 512² f32 NCHW → 256² u8 NHWC is 16×
            # less relay traffic; the conversion is exactly the
            # detector's own host-side one (truncating astype)
            ps = rcfg.collect_px_size
            if ps and px_full.shape[-1] > ps:
                px_full = jax.image.resize(
                    px_full, (*px_full.shape[:2], ps, ps), "linear")
            collected_px.append(jnp.clip(
                (px_full.transpose(0, 2, 3, 1) + 1.0) * 127.5,
                0, 255).astype(jnp.uint8))
        if have_arcface:
            from adaface_tpu.models.vae import SD_VAE

            # remat: the decoder's activations (512²·128ch temps) would
            # otherwise be stored for the backward pass — that alone OOMs
            # a v5e-16GB at bs4; recompute them in the bwd instead
            recon_px = jax.checkpoint(
                lambda p, z: vae_decode(
                    p, z.astype(dt),
                    rcfg.vae_cfg or SD_VAE).astype(jnp.float32)
            )(frozen["vae"], x_recon)
            pre = batch.get("recon_face_dets")
            if pre is not None:
                idx = len(det_fracs)  # active-step index
                fg_bb, det = pre["fg"][idx], pre["det"][idx]
                bg_bb, bg_val = pre["bgb"][idx], pre["bgv"][idx]
            else:
                fg_bb, det, _conf, bg_bb, bg_val = detect_faces_in_graph(
                    recon_px, detector, rcfg.max_bg_faces)
            det = det * batch.get("ref_face_detected", jnp.ones((b,)))
            la, lfg, _ = calc_arcface_align_loss(
                frozen["arcface"], batch["ref_images"], recon_px,
                batch["ref_face_bboxes"], fg_bb, det,
                fg_faces_grad_mask_ratios=(1.0, 0.3))
            lbg, bg_any = calc_bg_faces_suppress_loss(
                frozen["arcface"], recon_px, bg_bb, bg_val)
            g_any = (det.sum() > 0).astype(jnp.float32)
            thres = rcfg.recon_face_align_loss_thres  # static
            keep = g_any if thres <= 0 else \
                g_any * (la < thres).astype(jnp.float32)
            align_contribs.append(la * keep)
            align_keeps.append(keep)
            stat_contribs.append(la * g_any)
            stat_gates.append(g_any)
            bg_contribs.append(lbg)
            bg_gates.append(bg_any)
            det_fracs.append(det.mean())
            # instance weights 0.1 on undetected; whole-step 0.1 discount
            # when nothing detected (`:2736-2768`)
            inst_w = jnp.where(g_any > 0,
                               jnp.where(det > 0, 1.0, 0.1),
                               jnp.ones_like(det))
            scale_steps.append(jnp.where(g_any > 0, 1.0, 0.1))
            bb_lat = map_bboxes_to_latent(fg_bb, recon_px.shape[-1], hw)
            bb_mask = bbox_latent_mask(bb_lat, det, (hw, hw))
            fg2 = jnp.where(g_any > 0, fg_mask * bb_mask, fg_mask)
        else:
            inst_w = jnp.ones((b,))
            scale_steps.append(jnp.float32(1.0))
            fg2 = fg_mask

        if not collect_mode:
            # img_mask=None here: blank augmentation pixels ARE
            # regularized as background (`ddpm.py:2770-2775`)
            lr, lrc, lmb = calc_recon_and_suppress_losses(
                noise_i, eps_subj_cfg, eps_cls_cfg, inst_w,
                cap.get("attn", {}), subj_mask, None, fg2,
                rcfg.recon_bg_pixel_weight, on_noise)
            recon_steps.append(lr)
            recon_cls_steps.append(lrc)
            mb_steps.append(lmb)

        # ---- chain to the next step (`:1815-1827`) ----
        if i < s_total - 1:
            t_next = _next_t(t, rand["rel_ts"][i], s_total)
            # NOTE: gated on tower PRESENCE (not have_arcface) so the
            # collect pass perturbs the trajectory identically
            if (rcfg.do_adv_attack and not on_noise
                    and "arcface" in frozen and "vae" in frozen):
                noise_next_adj = _adv_attacked_noise(
                    frozen, batch, rand, rand["noises"][i + 1], rcfg, hw)
            x = x_recon if on_noise else x_start_in
            t = t_next

    if collect_mode:
        # phase-A output: decoded (downsized) recons for host detection
        # + the parameter-independent cls/uncond predictions the train
        # phase reuses; no loss
        out = {"recon_px": (jnp.stack(collected_px) if collected_px
                            else jnp.zeros((0,))),
               "eps_cls": (jnp.stack(collected_cls) if collected_cls
                           else jnp.zeros((0,))),
               "eps_un": (jnp.stack(collected_un) if collected_un
                          else jnp.zeros((0,)))}
        if primed is not None:
            out["x_primed"], out["t_primed"] = primed
        return jnp.float32(0.0), out

    # ------------------------------------------------------- aggregation
    arc_scale = 4.0 if on_noise else 1.0  # `:2804-2808`
    loss = jnp.float32(0.0)
    metrics: Params = {}

    if have_arcface:
        keeps = jnp.stack(align_keeps)
        loss_align = (jnp.stack(align_contribs).sum()
                      / (keeps.sum() + 1e-6)) * (keeps.sum() > 0)
        loss = loss + (loss_align * rcfg.arcface_align_loss_weight
                       * arc_scale)
        gates = jnp.stack(stat_gates)
        metrics["loss_arcface_align_recon"] = (
            jnp.stack(stat_contribs).sum() / (gates.sum() + 1e-6))
        bgg = jnp.stack(bg_gates)
        loss_bg = (jnp.stack(bg_contribs).sum() / (bgg.sum() + 1e-6)) \
            * (bgg.sum() > 0)
        # ×2 (×8 on pure noise), NOT multiplied by the arcface weight
        # (`:2826-2834`)
        loss = loss + loss_bg * 2.0 * arc_scale
        metrics["loss_bg_faces_suppress"] = loss_bg
        metrics["recon_face_detected_frac"] = jnp.stack(det_fracs).mean()
        metrics["recon_face_align_kept_frac"] = keeps.mean()

    scales = jnp.stack(scale_steps)
    loss_mb = jnp.stack(mb_steps).mean()
    if not on_noise:
        loss_recon = (jnp.stack(recon_steps) * scales).mean()
        loss = loss + loss_recon
        loss = loss + loss_mb * rcfg.recon_subj_mb_suppress_loss_weight
        metrics["loss_recon"] = jnp.stack(recon_steps).mean()
    # recon_cls is added on pure noise too (`:2871-2879`)
    loss_recon_cls = (jnp.stack(recon_cls_steps) * scales).mean()
    loss = loss + loss_recon_cls * rcfg.recon_cls_weight
    metrics["loss_recon_cls"] = jnp.stack(recon_cls_steps).mean()
    metrics["loss_mb_suppress"] = loss_mb
    metrics["pred_l2"] = jnp.stack(pred_l2s).mean()

    loss_delta = calc_prompt_emb_delta_loss(ctx4, batch.get("prompt_emb_mask"))
    loss = loss + cfg.prompt_emb_delta_weight * loss_delta
    metrics["loss_prompt_emb_delta"] = loss_delta
    metrics["loss"] = loss
    return loss, metrics


def _adv_attacked_noise(frozen, batch, rand, noise_next, rcfg, hw):
    """Adversarial ArcFace grad subtracted from the next step's noise
    (`ddpm.py:1879-1907`): grad of the dropped-out squared face embedding
    of decode(x_start), masked to the face bbox, scaled so its magnitude
    lands in recon_adv_mod_mag_range, capped at 10."""
    nb = min(rcfg.adv_bs, batch["x_start"].shape[0])
    x_adv = batch["x_start"][:nb]
    bb_px = batch["ref_face_bboxes"][:nb]
    bb_lat = map_bboxes_to_latent(bb_px, batch["ref_images"].shape[-1], hw)
    adv = calc_arcface_adv_grad(
        frozen["arcface"], frozen["vae"], x_adv, bb_lat, bb_px,
        rand["adv_dropout_key"], dropout_p=0.3, vae_cfg=rcfg.vae_cfg)
    adv = jax.lax.stop_gradient(adv)
    adv_max = jnp.abs(adv).max()
    fg = batch["fg_mask"][:nb]
    fg_mean = (jnp.abs(adv) * fg).sum() / (fg.sum() * adv.shape[1] + 1e-6)
    adv_mag = jnp.sqrt(adv_max * fg_mean)
    lo, hi = rcfg.recon_adv_mod_mag_range
    mod_mag = lo + (hi - lo) * rand["adv_uniform"]
    scale = jnp.minimum(mod_mag / (adv_mag + 1e-6), 10.0)
    # detection failure on the inputs → no attack (`:2545-2548`)
    ok = (batch.get("ref_face_detected", jnp.ones((nb,)))[:nb]
          .prod()).astype(adv.dtype)
    return jnp.concatenate(
        [noise_next[:nb] - adv * scale * ok, noise_next[nb:]], axis=0)


def make_recon_loss_fn(rcfg: ReconStepConfig,
                       detector: HostFaceDetector | None):
    """Bind the static recon config + host detector into a loss fn with
    the make_train_step calling convention."""

    def loss_fn(trainable, frozen, batch, schedule, cfg, rng):
        return recon_loss_fn_v2(trainable, frozen, batch, schedule, cfg,
                                rng, rcfg=rcfg, detector=detector)

    return loss_fn


def detections_to_batch(dets_flat, s_steps: int, b: int,
                        max_bg: int = 2) -> Params:
    """Host FaceDetections over [S*B] flattened images → the
    `recon_face_dets` batch entry ([S, B, ...] device arrays)."""
    import numpy as np

    return {
        "fg": jnp.asarray(np.asarray(dets_flat.fg_bboxes)
                          .reshape(s_steps, b, 4)),
        "det": jnp.asarray(np.asarray(dets_flat.detected)
                           .reshape(s_steps, b)),
        "conf": jnp.asarray(np.asarray(dets_flat.confidences)
                            .reshape(s_steps, b)),
        "bgb": jnp.asarray(np.asarray(dets_flat.bg_bboxes)
                           .reshape(s_steps, b, max_bg, 4)),
        "bgv": jnp.asarray(np.asarray(dets_flat.bg_valid)
                           .reshape(s_steps, b, max_bg)),
    }


def make_two_phase_recon_step(rcfg: ReconStepConfig,
                              detector: HostFaceDetector,
                              optimizer, frozen: Params,
                              schedule, cfg: TrainConfig, progress=None):
    """The two-phase recon step for backends WITHOUT host-callback
    support (e.g. the axon PJRT relay rejects pure_callback): a jitted
    no-grad collect pass returns the decoded recons, the host detects
    faces, and the jitted train step consumes the precomputed detections.
    Same math as the single-graph callback mode (verified equal in
    tests); costs one extra forward denoise (~25-30% of the step)."""
    from adaface_tpu.train.train_step import (
        make_frozen_caller, make_train_step)

    collect = make_frozen_caller(
        lambda frozen_, params, batch, rng: recon_loss_fn_v2(
            params, frozen_, batch, schedule, cfg, rng, rcfg=rcfg,
            detector=None, collect_mode=True)[1],
        frozen)
    loss_fn = make_recon_loss_fn(rcfg, None)  # dets come from the batch
    step = make_train_step(loss_fn, optimizer, frozen, schedule, cfg,
                           donate=False)

    note = progress if progress is not None else (lambda msg: None)

    def detect_on(out, batch):
        """Host detection on phase A's (downsized) recons → the phase-B
        batch with detections rescaled to the full decode resolution."""
        import numpy as np

        px = out["recon_px"]  # [S_active, B, ps, ps, 3] uint8
        s_steps, b = px.shape[0], px.shape[1]
        flat = np.asarray(px).reshape(s_steps * b, *px.shape[2:])
        full_px = batch["x_start"].shape[-1] * (
            rcfg.vae_cfg.spatial_scale if rcfg.vae_cfg is not None else 8)
        scale = full_px / px.shape[2]
        # min_size is a full-res threshold; shrink it to the downsized
        # detection space so both backends filter faces at the same size
        orig_min = getattr(detector, "min_size", None)
        if orig_min is not None and scale != 1.0:
            detector.min_size = max(1, int(round(orig_min / scale)))
        try:
            dets = detector(flat)
        finally:
            if orig_min is not None:
                detector.min_size = orig_min
        if scale != 1.0:
            dets.fg_bboxes = dets.fg_bboxes * scale
            dets.bg_bboxes = dets.bg_bboxes * scale
        phase_a = {"eps_cls": out["eps_cls"], "eps_un": out["eps_un"]}
        if "x_primed" in out:
            phase_a["x_primed"] = out["x_primed"]
            phase_a["t_primed"] = out["t_primed"]
        return dict(batch,
                    recon_face_dets=detections_to_batch(
                        dets, s_steps, b, detector.max_bg),
                    recon_phase_a=phase_a)

    def run(state, batch, rng):
        out = collect(state.params, batch, rng)
        note("collect done (recon denoise decoded)")
        batch2 = detect_on(out, batch)
        return step(state, batch2, rng)

    # expose the phases for pipelined callers (trainer overlap mode)
    run.collect = lambda state, batch, rng: collect(state.params, batch, rng)
    run.detect_on = detect_on
    run.train = step
    return run


def make_pipelined_recon_runner(two_phase_run):
    """Software-pipeline the two-phase recon step across consecutive
    iterations: collect(N+1) is enqueued on the device BEFORE train(N),
    so the device never idles between steps — throughput ≈
    1/max(t_collect, t_train) instead of 1/(t_collect + t_train), and
    host detection overlaps device compute.

    Semantics: collect(N+1) runs with the params BEFORE step N's
    optimizer update. For recon-on-images the cls/uncond anchors are
    parameter-independent (x_t = q_sample(x_start, t, noise) and the
    cls/uncond contexts carry no trainable state when attn-LoRA is off),
    so the anchors stay EXACT; only the detected face bboxes lag one
    optimizer step — negligible against the reference's own detector
    stochasticity, but opt-in (`TrainerConfig.overlap_recon_collect`)
    because it is not bitwise the sequential choreography.

    Usage:
        runner = make_pipelined_recon_runner(step_fn)
        for batch, rng in stream:
            out = runner.push(state, batch, rng)   # None while priming
            if out is not None:
                state, metrics = out
        state, metrics = runner.flush(state)
    """

    class _Runner:
        def __init__(self):
            self._pending = None  # (collect_out, batch, rng)

        def push(self, state, batch, rng):
            out_next = two_phase_run.collect(state, batch, rng)
            pending, self._pending = self._pending, (out_next, batch, rng)
            if pending is None:
                return None
            out, b_prev, r_prev = pending
            # blocks on px readback of the PREVIOUS collect — which has
            # already finished while this step's collect was enqueued
            batch2 = two_phase_run.detect_on(out, b_prev)
            return two_phase_run.train(state, batch2, r_prev)

        def flush(self, state):
            if self._pending is None:
                return None
            (out, b_prev, r_prev), self._pending = self._pending, None
            batch2 = two_phase_run.detect_on(out, b_prev)
            return two_phase_run.train(state, batch2, r_prev)

    return _Runner()
