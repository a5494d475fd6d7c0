"""Comp-iteration identity losses + SS re-denoise (detection on recons).

Rebuild of the face-dependent half of `calc_comp_feat_distill_loss`
(`ldm/models/diffusion/ddpm.py:3190-3600`):

- `detect_on_recons`: ONE host callback (train/face_detect.py) over the
  decoded SS recons of all steps + the SC recons of all steps + the
  last-step MC recon (`ddpm.py:3225-3301` uses `retinaface.crop_faces`
  on the same sets).
- `comp_face_align_losses`: the reversed-step loop of
  `calc_comp_face_align_and_mb_suppress_losses` (`ddpm.py:3602-3733`) —
  per-step `loss_arcface_align_comp` vs the input image with the ≤3
  kept-step budget and the 0.7 keep-threshold, fg/bg-faces suppress,
  and `loss_comp_sc_subj_mb_suppress` on the detected-face mask —
  expressed as {0,1} step weights over a static S-step loop.
- `classify_sc_face_proportion` (`ddpm.py:3337-3368`): the 6-way face
  proportion type as a one-hot, driving the align/suppress loss scales
  and the bg-matching shrink ratio.
- `redenoise_subj_single_graph` (`redenoise_subj_single`,
  `ddpm.py:2093-2266`): SS re-denoised from SC-face-crop-mixed starts
  (paste_resized_crop ≡ the crop + `F.interpolate` + weighted-average
  write-back at `:2118-2145`), per-step replacement of the SS block of
  the captured activations gated on detection confidence ≥0.99 and
  Laplacian-variance ≥ 0.3× the original face crop's.

Everything data-dependent becomes masked arithmetic; the only host hops
are the detection callbacks.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.unet import AttnRuntime, unet_apply
from adaface_tpu.models.vae import SD_VAE, vae_decode
from adaface_tpu.train.face_detect import (
    HostFaceDetector,
    detect_faces_in_graph,
    map_bboxes_to_latent,
)
from adaface_tpu.train.face_losses import (
    bilinear_crop,
    calc_arcface_align_loss,
    calc_bg_faces_suppress_loss,
)
from adaface_tpu.train.losses import calc_subj_masked_bg_suppress_loss
from adaface_tpu.train.recon_multistep import var_of_laplacian

Params = dict[str, Any]


def _detect_size(px: jax.Array, comp_cfg) -> jax.Array:
    """Downsample + uint8-NHWC decoded frames on-device before the
    host-detection readback (the detector only needs ~256² u8; the
    in-graph ArcFace crops and Laplacian gates always see the full-res
    decode) — 64× less relay traffic at 512² f32. The conversion is
    exactly the detector's own host-side one (truncating astype); the
    three-phase runner rescales the returned bboxes back to the full
    decode resolution. Output [..., ps, ps, 3] uint8."""
    ps = getattr(comp_cfg, "collect_px_size", 0)
    if ps and px.shape[-1] > ps:
        px = jax.image.resize(px, (*px.shape[:-2], ps, ps), "linear")
    nhwc = jnp.moveaxis(px, -3, -1)
    return jnp.clip((nhwc + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _bbox_mask(bboxes: jax.Array, h: int, w: int) -> jax.Array:
    """[B,4] → [B,1,h,w] {0,1} mask (zeros outside)."""
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    x0, y0, x1, y1 = [bboxes[:, i, None, None] for i in range(4)]
    m = ((xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1))
    return m.astype(jnp.float32)[:, None]


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """img [C,H,W], ys/xs [H',W'] float coords → [C,H',W']."""
    h, w = img.shape[-2:]
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None]
    wx = (xs - x0)[None]
    g00 = img[:, y0, x0]
    g01 = img[:, y0, x1]
    g10 = img[:, y1, x0]
    g11 = img[:, y1, x1]
    return (g00 * (1 - wy) * (1 - wx) + g01 * (1 - wy) * wx
            + g10 * wy * (1 - wx) + g11 * wy * wx)


def paste_resized_crop(
    dst: jax.Array,  # [B, C, H, W]
    dst_bboxes: jax.Array,  # [B, 4] (x0, y0, x1, y1)
    src: jax.Array,  # [B, C, H, W]
    src_bboxes: jax.Array,  # [B, 4]
    mix_weights: tuple[float, float, float] = (0.5, 0.25, 0.25),
    rand_noise: jax.Array | None = None,  # like dst
) -> jax.Array:
    """Resize src's src_bbox region onto dst's dst_bbox region and blend:
    crop·w0 + randn·w1 + dst·w2 inside the box, dst outside
    (`redenoise_subj_single`, `ddpm.py:2118-2145`; `F.interpolate`
    bilinear align_corners=False semantics)."""
    b, c, h, w = dst.shape
    w0, w1, w2 = mix_weights
    if rand_noise is None:
        rand_noise = jnp.zeros_like(dst)
        w2 = w2 + w1
        w1 = 0.0

    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))

    def per_image(d, s, db, sb, rn):
        dx0, dy0, dx1, dy1 = db[0], db[1], db[2], db[3]
        sx0, sy0, sx1, sy1 = sb[0], sb[1], sb[2], sb[3]
        dw = jnp.maximum(dx1 - dx0, 1.0)
        dh = jnp.maximum(dy1 - dy0, 1.0)
        sw = jnp.maximum(sx1 - sx0, 1.0)
        sh = jnp.maximum(sy1 - sy0, 1.0)
        # F.interpolate(align_corners=False): src = (i+0.5)*scale − 0.5
        sy = sy0 + (yy - dy0 + 0.5) * (sh / dh) - 0.5
        sx = sx0 + (xx - dx0 + 0.5) * (sw / dw) - 0.5
        sampled = _bilinear_sample(s, sy, sx)  # [C, H, W]
        inside = ((xx >= dx0) & (xx < dx1) & (yy >= dy0) & (yy < dy1)
                  ).astype(d.dtype)[None]
        blended = sampled * w0 + rn * w1 + d * w2
        return d * (1 - inside) + blended * inside

    return jax.vmap(per_image)(dst, src, dst_bboxes.astype(jnp.float32),
                               src_bboxes.astype(jnp.float32), rand_noise)


# ---------------------------------------------------------------------------
# proportion classification (`ddpm.py:3337-3368`)
# ---------------------------------------------------------------------------

PROPORTION_TYPES = ("sc-noface", "mc-no-sc-large", "little-no-overlap",
                    "too-small", "too-large", "good")


def classify_sc_face_proportion(
    sc_pct: jax.Array,  # scalar
    mc_pct: jax.Array,  # scalar
    overlap_frac: jax.Array,  # (sc∧mc).sum / sc.sum
    pct_range: tuple[float, float] = (0.0225, 0.36),
) -> jax.Array:
    """→ one-hot [6] over PROPORTION_TYPES, following the reference's
    elif chain exactly."""
    lo, hi = pct_range
    conds = [
        sc_pct == 0,
        (mc_pct == 0) & (sc_pct >= 0.16 * hi),
        (mc_pct > 0) & (overlap_frac < 0.16),
        sc_pct <= lo,
        (sc_pct >= hi) | ((mc_pct > 0) & (sc_pct >= 6.25 * mc_pct)),
    ]
    idx = jnp.select(conds, [0, 1, 2, 3, 4], default=5)
    return jax.nn.one_hot(idx, 6, dtype=jnp.float32)


def compute_align_scales(
    prop: jax.Array,  # [6] one-hot over PROPORTION_TYPES
    frac: jax.Array,  # comp_sc_face_detected_frac (window incl. this iter)
    loss_align: jax.Array,  # kept-mean align loss (0 when nothing kept)
    loss_fg_sup: jax.Array,  # fg-faces suppress loss
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The arcface-align / fg-suppress loss-scale arithmetic
    (`ddpm.py:3372-3455`): extra scale 3 for 'too-small'/'good' else 1.5;
    × min(4, 1/(frac²+0.01)); fg-suppress base scale {5,10,10} for the
    suppressed types, clamped to [base/2, base] of 0.1× the scaled align
    loss. → (loss_align_scaled, supp_scale, do_suppress {0,1})."""
    extra_scale = (prop[3] + prop[5]) * 3.0 \
        + (prop[1] + prop[2] + prop[4]) * 1.5
    align_scale = extra_scale * jnp.minimum(4.0, 1.0 / (frac ** 2 + 0.01))
    la_scaled = loss_align * align_scale

    do_suppress = prop[1] + prop[2] + prop[4]  # {0,1}
    supp_base = prop[1] * 5.0 + prop[2] * 10.0 + prop[4] * 10.0
    # exact division (the reference has no epsilon, `ddpm.py:3444`); the
    # ratio is only consumed when loss_fg_sup > 0
    safe_fg = jnp.where(loss_fg_sup > 0, loss_fg_sup, 1.0)
    ratio = jax.lax.stop_gradient(la_scaled) / jax.lax.stop_gradient(safe_fg)
    supp_scale = jnp.where(
        (la_scaled > 0) & (loss_fg_sup > 0),
        jnp.clip(ratio * 0.1, supp_base / 2.0, supp_base + 1e-6),
        supp_base)
    return la_scaled, supp_scale, do_suppress


def assemble_align_gates(
    la_arr: jax.Array,  # [S] per-step align losses
    g_any: jax.Array,  # [S] {0,1} face-detected-this-step (already gated
    #                    by the all-SS condition)
    thres: float,
    max_count: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The reversed-step kept/computed/stat gates of
    `calc_comp_face_align_and_mb_suppress_losses` (`ddpm.py:3628-3673`):
    iterating from the LAST (clearest) step down, the align loss is
    computed while fewer than `max_count` steps have been KEPT; a
    detected step is kept when its loss is ≤ thres (thres ≤ 0 disables
    the threshold); `stat` marks detected+computed steps (logged
    regardless of the threshold). → ({0,1}[S] kept, computed, stat)."""
    s_steps = la_arr.shape[0]
    kept_rev, computed_rev = [], []
    kept_before = jnp.float32(0.0)
    for s in range(s_steps - 1, -1, -1):
        computed = (kept_before < max_count).astype(jnp.float32)
        under = (la_arr[s] <= thres).astype(jnp.float32) if thres > 0 \
            else jnp.float32(1.0)
        kept = g_any[s] * computed * under
        computed_rev.append(computed)
        kept_rev.append(kept)
        kept_before = kept_before + kept
    return (jnp.stack(list(reversed(kept_rev))),
            jnp.stack(list(reversed(computed_rev))),
            g_any * jnp.stack(list(reversed(computed_rev))))


# ---------------------------------------------------------------------------
# SS re-denoise (`ddpm.py:2093-2266`)
# ---------------------------------------------------------------------------

def ss_redenoise_loop(
    unet_params: Params,
    unet_cfg,
    schedule,
    xs_mixed: list[jax.Array],  # S × [B, 4, h, w] crop-mixed starts
    noises: list[jax.Array],  # S × [B, 4, h, w] crop-mixed noises
    ts: list[jax.Array],  # S × [B]
    ctx_ss: jax.Array,  # [B, S, D]
    uncond_ctx: jax.Array,  # [1, S, D]
    attn_lora: Params | None,
    ffn_lora: Params | None,
    cfg,
):
    """No-grad SS-only re-denoise with old_x_starts_mix_ratio=0.3 chaining
    (`comp_distill_multistep_denoise` called from `redenoise_subj_single`
    with BLKS=1, batch_part_has_grad='none', no attn augmentation).
    → (captured list, x_recons list)."""
    s_steps = len(xs_mixed)
    b = xs_mixed[0].shape[0]
    dt = jnp.dtype(cfg.compute_dtype)
    use_attn_lora = cfg.use_attn_lora and attn_lora is not None
    use_ffn_lora = cfg.use_ffn_lora and ffn_lora is not None
    rt = AttnRuntime(capture=True, use_attn_lora=use_attn_lora,
                     use_ffn_lora=use_ffn_lora, ffn_adapter="comp_distill")
    rt_un = AttnRuntime(use_ffn_lora=use_ffn_lora,
                        ffn_adapter="comp_distill")
    un = jnp.broadcast_to(uncond_ctx, (b, *uncond_ctx.shape[1:])).astype(dt)
    ctx_h = ctx_ss.astype(dt)
    s_cfg = cfg.denoise_cfg_scale

    # lax.scan instead of a python unroll: ONE cond + ONE uncond UNet
    # body in the HLO for the whole no-grad re-denoise (the unrolled
    # 4-step loop contributed to the relay compile-helper OOM,
    # VERDICT r4 #1)
    xs_st = jnp.stack(xs_mixed)  # [S, B, 4, h, w]
    noises_st = jnp.stack(noises)
    ts_arr = jnp.stack(ts)  # [S, B]

    def body(carry, inp):
        prev_recon, first = carry
        x_mix, noise_i, t = inp
        # step 0 starts from xs_mixed[0]; later steps chain with
        # old_x_starts_mix_ratio = 0.3 (`ddpm.py:2082-2084`)
        x = x_mix * (first + 0.3 * (1.0 - first)) \
            + prev_recon * 0.7 * (1.0 - first)
        x_t = schedule.q_sample(x, t, noise_i)
        eps, cap = unet_apply(
            unet_params, x_t.astype(dt), t, ctx_h, unet_cfg,
            rt=rt, attn_lora=attn_lora if use_attn_lora else None,
            ffn_lora=ffn_lora if use_ffn_lora else None)
        eps_un, _ = unet_apply(
            unet_params, x_t.astype(dt), t, un, unet_cfg,
            rt=rt_un, ffn_lora=ffn_lora if use_ffn_lora else None)
        eps_cfg = (eps.astype(x.dtype) * s_cfg
                   - eps_un.astype(x.dtype) * (s_cfg - 1.0))
        x_recon = schedule.predict_start_from_noise(x_t, t, eps_cfg)
        x_recon = jax.lax.stop_gradient(x_recon)
        cap = jax.tree_util.tree_map(jax.lax.stop_gradient, cap)
        return (x_recon, jnp.float32(0.0)), (cap, x_recon)

    init = (jnp.zeros_like(xs_st[0]), jnp.float32(1.0))
    _, (caps_st, recons_st) = jax.lax.scan(
        body, init, (xs_st, noises_st, ts_arr))
    idx = lambda i: (lambda v: v[i])  # noqa: E731
    captured = [jax.tree_util.tree_map(idx(i), caps_st)
                for i in range(s_steps)]
    recons = [recons_st[i] for i in range(s_steps)]
    return captured, recons


# ---------------------------------------------------------------------------
# the identity-loss orchestration
# ---------------------------------------------------------------------------

def comp_identity_losses(
    frozen: Params,  # needs vae, arcface, unet
    detector: HostFaceDetector,
    x_recons: list[jax.Array],  # S × [4B, 4, h, w]
    x_inputs: list[jax.Array],  # S × [4B, 4, h, w] per-step chain inputs
    den_noises: jax.Array,  # [S, B, 4, h, w]
    ts: list[jax.Array],  # S × [4B]
    captured_steps: list[Params],
    ctx_ss: jax.Array,
    uncond_ctx: jax.Array,
    subj_mask_1b: jax.Array,  # [B, S]
    batch: Params,  # ref_images / ref_face_bboxes / ref_face_detected /
    #                 comp_sc_face_detected_mean / comp_sc_face_detected_n
    attn_lora: Params | None,
    ffn_lora: Params | None,
    unet_cfg,
    schedule,
    comp_cfg,
    stage: str = "full",
) -> tuple[jax.Array, Params, Params]:
    """→ (loss_contrib, aux, metrics). aux carries the per-step gates and
    masks the main comp loss assembly needs:
    {sc_fg_mask_percent, fg_bg_step_gates [S], ss_bboxes_per_step [S,B,4],
     sc_fg_face_bboxes [B,4], sc_fg_mask, shrink_ratio, first_detected_ok}.

    `stage` drives the callback-less three-phase choreography for PJRT
    backends without host-callback support (the axon relay — same
    constraint as recon's `make_two_phase_recon_step`, but the comp
    family has a detection→redenoise→detection dependency chain):
    - "collect1": stop after decoding — aux = {"comp_px": {ssmc, sc}}
      for host detection; no callbacks in the graph.
    - "collect2": round-1 detections ride in `batch["comp_face_dets"]`;
      run the crop-mix SS re-denoise and return its decoded pixels
      (aux = {"ss2_px"}) for the second host detection.
    - "full": run everything; detections come from the callbacks when
      `detector` is given, else entirely from `batch["comp_face_dets"]`
      (keys ssmc_fg/det/conf, sc_fg/det/bgb/bgv, ss2_fg/det/conf).
    """
    s_steps = len(x_recons)
    b4 = x_recons[0].shape[0]
    b = b4 // 4
    hw = x_recons[0].shape[-1]
    vae_cfg = comp_cfg.vae_cfg or SD_VAE
    w_arc = comp_cfg.arcface_align_loss_weight
    metrics: Params = {}
    dets = batch.get("comp_face_dets")
    # decodes in the step's compute dtype (reference fp16-autocasts this
    # region); losses and detection see f32
    dt = jnp.dtype(comp_cfg.compute_dtype)

    def decode(z):
        return vae_decode(frozen["vae"], z.astype(dt),
                          vae_cfg).astype(jnp.float32)

    # ---- decode + detect: SS all steps, MC last step (one callback) ----
    ss_lat = jnp.concatenate([jax.lax.stop_gradient(x_recons[s][:b])
                              for s in range(s_steps)], axis=0)
    mc_lat = jax.lax.stop_gradient(x_recons[-1][3 * b:])
    ssmc_px = decode(jnp.concatenate([ss_lat, mc_lat], axis=0))
    ss_px = ssmc_px[:s_steps * b]
    mc_px = ssmc_px[s_steps * b:]
    px = ss_px.shape[-1]
    if stage == "collect1":
        # one decoder body over the concatenated per-step SC latents
        # (was an unrolled per-step decode loop)
        sc_lat = jnp.concatenate(
            [jax.lax.stop_gradient(x_recons[s][b:2 * b])
             for s in range(s_steps)], axis=0)
        sc_px_flat = decode(sc_lat)
        sc_px_steps = sc_px_flat.reshape(s_steps, b, *sc_px_flat.shape[1:])
        aux = {"comp_px": {"ssmc": _detect_size(ssmc_px, comp_cfg),
                           "sc": _detect_size(sc_px_steps, comp_cfg)}}
        return jnp.float32(0.0), aux, metrics
    if dets is not None:
        fg_bb_all = dets["ssmc_fg"]
        det_all = dets["ssmc_det"]
        conf_all = dets["ssmc_conf"]
    else:
        fg_bb_all, det_all, conf_all, _, _ = detect_faces_in_graph(
            ssmc_px, detector, comp_cfg.max_bg_faces)
    ss_bb = fg_bb_all[:s_steps * b].reshape(s_steps, b, 4)
    ss_det = det_all[:s_steps * b].reshape(s_steps, b)
    ss_conf = conf_all[:s_steps * b].reshape(s_steps, b)
    mc_bb, mc_det = fg_bb_all[s_steps * b:], det_all[s_steps * b:]

    # all SS instances of the LAST step detected w/ confidence ≥ 0.99
    # (`ddpm.py:3242-3248`)
    all_ss = (ss_det[-1].prod()
              * (ss_conf[-1].min() >= comp_cfg.comp_ss_face_confidence_thres)
              ).astype(jnp.float32)
    ss_bb_lat_last = map_bboxes_to_latent(ss_bb[-1], px, hw)

    # ---- per-step SC align loop, reversed (`ddpm.py:3628-3709`) ----
    # lax.scan over the steps: ONE remat'd decoder + ONE arcface body in
    # the HLO instead of s_steps copies (relay compile-OOM fix). The
    # remat is kept: the SC block carries gradients through the decode
    # into the arcface losses; storing decoder activations for the bwd
    # OOMs HBM at 512².
    x_rec_sc = jnp.stack([x_recons[s][b:2 * b] for s in range(s_steps)])
    ref_det = batch.get("ref_face_detected", jnp.ones((b,)))

    def align_body(_, inp):
        z = inp[0]
        sc_px = jax.checkpoint(
            lambda p, zz: vae_decode(p, zz.astype(dt),
                                     vae_cfg).astype(jnp.float32))(
                frozen["vae"], z)
        if dets is not None:
            _, sc_fg_bb, sc_det, sc_bgbb, sc_bgv = inp
        else:
            sc_fg_bb, sc_det, _, sc_bgbb, sc_bgv = detect_faces_in_graph(
                sc_px, detector, comp_cfg.max_bg_faces)
        det = sc_det * ref_det
        la, lfg, _ = calc_arcface_align_loss(
            frozen["arcface"], batch["ref_images"][:b], sc_px,
            batch["ref_face_bboxes"][:b], sc_fg_bb, det,
            fg_faces_grad_mask_ratios=(
                0.9, comp_cfg.sc_fg_face_suppress_mask_shrink_ratio))
        lbg, bga = calc_bg_faces_suppress_loss(frozen["arcface"], sc_px,
                                               sc_bgbb, sc_bgv)
        g = (det.sum() > 0).astype(jnp.float32)
        return 0, (la, lfg, lbg, bga, g,
                   map_bboxes_to_latent(sc_fg_bb, px, hw))

    xs_in = (x_rec_sc,) if dets is None else (
        x_rec_sc, dets["sc_fg"], dets["sc_det"], dets["sc_bgb"],
        dets["sc_bgv"])
    _, (la_arr, lfg_arr, lbg_arr, lbg_any_arr, g_steps,
        sc_bb_lat_st) = jax.lax.scan(align_body, 0, xs_in)
    sc_bb_lat_steps = [sc_bb_lat_st[s] for s in range(s_steps)]

    # the reference enters the SC align loop only when ALL last-step SS
    # instances have confident faces (`ddpm.py:3247`): fold the gate into
    # g_any so every downstream mask/count/stat inherits it
    g_any = g_steps * all_ss  # [S]

    kept, computed, stat = assemble_align_gates(
        la_arr, g_any, comp_cfg.comp_sc_face_align_loss_thres,
        comp_cfg.max_arcface_align_loss_count)

    loss_align = (la_arr * kept).sum() / (kept.sum() + 1e-6)
    metrics["loss_arcface_align_comp"] = \
        (la_arr * stat).sum() / (stat.sum() + 1e-6)
    metrics["comp_sc_face_align_kept_frac"] = \
        kept.sum() / (stat.sum() + 1e-6)
    fg_pos = (lfg_arr > 0).astype(jnp.float32) * stat
    loss_fg_sup = (lfg_arr * fg_pos).sum() / (fg_pos.sum() + 1e-6)
    bg_pos = lbg_any_arr * stat
    loss_bg_sup = (lbg_arr * bg_pos).sum() / (bg_pos.sum() + 1e-6) \
        * (bg_pos.sum() > 0)

    # first (reversed) detected step s* → sc_fg_mask + bboxes from it
    # (`ddpm.py:3676-3688`)
    det_any_at_all = (g_any.max() > 0).astype(jnp.float32)
    s_star = jnp.argmax(g_any * (jnp.arange(s_steps) + 1))  # max s detected
    onehot = jax.nn.one_hot(s_star, s_steps) * det_any_at_all  # [S]
    sc_bb_lat = jnp.einsum("s,sbi->bi", onehot, jnp.stack(sc_bb_lat_steps))
    sc_fg_mask = _bbox_mask(sc_bb_lat, hw, hw) * det_any_at_all
    sc_pct = sc_fg_mask.mean()

    # mb-suppress per step with the s* mask, steps s ≤ s* (`:3697-3709`).
    # NOTE: the reference's `ca_layers_activations` variable is only
    # reassigned on DETECTED steps (`ddpm.py:3675`), so an undetected
    # step's mb term reuses the attn of the nearest detected step ABOVE
    # it in the reversed iteration — replicated exactly.
    mb_all = []
    for s in range(s_steps):
        sc_attn = {k: jnp.split(v, 4)[1]
                   for k, v in captured_steps[s]["attn"].items()}
        mb_all.append(calc_subj_masked_bg_suppress_loss(
            sc_attn, subj_mask_1b, sc_fg_mask))
    mb_steps = []
    for s in range(s_steps):
        pick = jnp.float32(0.0)
        found = jnp.float32(0.0)
        for sp in range(s, s_steps):
            w = g_any[sp] * (1.0 - found)
            pick = pick + mb_all[sp] * w
            found = jnp.maximum(found, g_any[sp])
        mb_steps.append(pick)
    mb_w = (jnp.arange(s_steps) <= s_star).astype(jnp.float32) \
        * det_any_at_all
    loss_mb = (jnp.stack(mb_steps) * mb_w).sum() / (mb_w.sum() + 1e-6)

    # ---- MC mask + percent (`:3284-3330`) ----
    mc_all = mc_det.prod().astype(jnp.float32)
    mc_bb_lat = map_bboxes_to_latent(mc_bb, px, hw)
    mc_fg_mask = _bbox_mask(mc_bb_lat, hw, hw) * mc_all
    mc_pct = mc_fg_mask.mean()
    overlap = (sc_fg_mask * mc_fg_mask).sum() / (sc_fg_mask.sum() + 1e-6)
    prop = classify_sc_face_proportion(
        sc_pct, mc_pct, overlap, comp_cfg.comp_sc_fg_mask_percent_range)
    metrics["sc_fg_mask_percent"] = sc_pct
    metrics["mc_fg_mask_percent"] = mc_pct
    metrics["sc_face_proportion_type"] = jnp.argmax(prop).astype(jnp.float32)
    metrics["comp_sc_face_detected"] = det_any_at_all
    metrics["comp_mc_face_detected"] = mc_all

    # ---- loss scales (`:3372-3464`) ----
    # rolling comp_sc_face_detected_frac updated in-graph with this
    # iteration's indicator (the reference updates the window BEFORE
    # computing the scale, `ddpm.py:3380-3396`; the indicator is
    # loss_arcface_align_comp > 0, i.e. a KEPT align step exists)
    kept_any = (kept.sum() > 0).astype(jnp.float32)
    prev_mean = batch.get("comp_sc_face_detected_mean", jnp.float32(1.0))
    prev_n = batch.get("comp_sc_face_detected_n", jnp.float32(0.0))
    frac = (prev_mean * prev_n + kept_any) / (prev_n + 1.0)
    metrics["comp_sc_face_detected_frac"] = frac
    metrics["comp_sc_face_kept_any"] = kept_any  # host RollingStats feed
    la_scaled, supp_scale, do_suppress = compute_align_scales(
        prop, frac, loss_align * kept_any, loss_fg_sup)

    loss = jnp.float32(0.0)
    # all_ss gates the whole align family (`ddpm.py:3247-3277`)
    loss = loss + loss_bg_sup * 400.0 * w_arc * all_ss
    loss = loss + loss_mb * comp_cfg.comp_sc_subj_mb_suppress_loss_weight \
        * all_ss
    loss = loss + la_scaled * w_arc * all_ss
    loss = loss + loss_fg_sup * supp_scale * w_arc * do_suppress * all_ss \
        * (fg_pos.sum() > 0)

    # ---- SS re-denoise (`:3402-3427` → `redenoise_subj_single`) ----
    noises_sc = [den_noises[s] for s in range(s_steps)]  # == noises_ss
    mixed_xs, mixed_noises = [], []
    k_mix = batch.get("redenoise_rand")
    for s in range(s_steps):
        ss_x = jax.lax.stop_gradient(x_inputs[s][:b])
        sc_x = jax.lax.stop_gradient(x_inputs[s][b:2 * b])
        rn_x = (k_mix["x"][s] if k_mix is not None
                else jnp.zeros_like(ss_x))
        rn_n = (k_mix["n"][s] if k_mix is not None
                else jnp.zeros_like(ss_x))
        mixed_xs.append(paste_resized_crop(
            ss_x, ss_bb_lat_last, sc_x, sc_bb_lat,
            comp_cfg.redenoise_crop_mix_weights, rn_x))
        mixed_noises.append(paste_resized_crop(
            noises_sc[s], ss_bb_lat_last, noises_sc[s], sc_bb_lat,
            comp_cfg.redenoise_crop_mix_weights, rn_n))
    ts_ss = [t[:b] for t in ts]
    cap2, recons2 = ss_redenoise_loop(
        frozen["unet"], unet_cfg, schedule, mixed_xs, mixed_noises, ts_ss,
        ctx_ss, uncond_ctx, attn_lora, ffn_lora, comp_cfg)

    # round-2 detection + quality gates (`:2179-2260`)
    ss2_lat = jnp.concatenate(recons2, axis=0)
    ss2_px = decode(ss2_lat)
    if stage == "collect2":
        return jnp.float32(0.0), {"ss2_px": _detect_size(ss2_px, comp_cfg)
                                  }, metrics
    if dets is not None and "ss2_fg" in dets:
        ss2_bb, ss2_det, ss2_conf = (dets["ss2_fg"], dets["ss2_det"],
                                     dets["ss2_conf"])
    else:
        ss2_bb, ss2_det, ss2_conf, _, _ = detect_faces_in_graph(
            ss2_px, detector, comp_cfg.max_bg_faces)
    ss2_bb_st = ss2_bb.reshape(s_steps, b, 4)
    ss2_det_st = ss2_det.reshape(s_steps, b)
    ss2_conf_st = ss2_conf.reshape(s_steps, b)
    # Laplacian variance of the 128x128 face crops, round 1 vs round 2
    crops1 = bilinear_crop(ss_px, fg_bb_all[:s_steps * b], 128)
    crops2 = bilinear_crop(ss2_px, ss2_bb, 128)
    lap1 = var_of_laplacian(crops1).reshape(s_steps, b).mean(-1)
    lap2 = var_of_laplacian(crops2).reshape(s_steps, b).mean(-1)

    round2_ok = ss2_det_st[-1].prod().astype(jnp.float32)
    good_conf = (ss2_conf_st.mean(-1)
                 >= comp_cfg.comp_ss_face_confidence_thres)
    is_clear = lap2 >= lap1 * comp_cfg.lap_vars_tolerance
    # skip the redenoise entirely when sc face wasn't detected
    # (`sc_face_proportion_type == 'sc-noface'`, `:3402,3420-3424`)
    try_redenoise = 1.0 - prop[0]
    repl = (good_conf & is_clear).astype(jnp.float32) * round2_ok \
        * try_redenoise  # [S]
    metrics["comp_ss_redenoise_success_frac"] = repl.mean()

    # per-step replacement of the SS block of the captured activations
    new_captured = []
    ss_bboxes_per_step = []
    ss2_bb_lat_st = map_bboxes_to_latent(
        ss2_bb.reshape(s_steps, b, 4), px, hw)
    for s in range(s_steps):
        w_s = repl[s]

        def repl_leaf(v, v2):
            parts = jnp.split(v, 4, axis=0)
            ss_new = v2 * w_s + parts[0] * (1 - w_s)
            return jnp.concatenate([ss_new] + parts[1:], axis=0)

        new_captured.append(jax.tree_util.tree_map(
            repl_leaf, captured_steps[s], cap2[s]))
        ss_bboxes_per_step.append(
            ss2_bb_lat_st[s] * w_s + ss_bb_lat_last * (1 - w_s))

    # fg_bg_preserve step gates: steps ≥ s*, only when all_ss and a face
    # was detected in SC (`:3488-3503`)
    fg_bg_gates = ((jnp.arange(s_steps) >= s_star).astype(jnp.float32)
                   * all_ss * det_any_at_all)
    # cross-t-diff gates: s ∈ [s*−1, S−2] (`:3496-3500`)
    ct_gates = (((jnp.arange(s_steps) >= s_star - 1)
                 & (jnp.arange(s_steps) < s_steps - 1)).astype(jnp.float32)
                * all_ss * det_any_at_all)
    shrink = (do_suppress * comp_cfg.sc_fg_face_suppress_mask_shrink_ratio
              + (1.0 - do_suppress) * 1.0)

    aux = {
        "sc_fg_mask_percent": sc_pct,
        "sc_fg_face_bboxes": sc_bb_lat,
        "sc_fg_mask": sc_fg_mask,
        "ss_bboxes_per_step": ss_bboxes_per_step,
        "fg_bg_gates": fg_bg_gates,
        "ct_gates": ct_gates,
        "shrink_ratio": shrink,
        "do_sc_fg_faces_suppress": do_suppress,
        "captured_steps": new_captured,
    }
    return loss, aux, metrics
