"""Training loss library (stage-1 recon/distill core).

JAX rebuilds of the reference's loss functions in `ldm/util.py`, written
with static shapes and mask tensors (no data-dependent indexing) so every
loss jits cleanly:

- calc_recon_loss            (`ldm/util.py:1678-1711`) — fg/bg-weighted
  masked MSE between predicted and target noise.
- calc_recon_and_suppress_losses (`:1715-1756`) — recon + cls-guided bg
  recon + subject-attention background suppression.
- calc_subj_masked_bg_suppress_loss (`:1822-1920`) — suppress subject-token
  cross-attention outside the fg mask on layers 23/24.
- calc_prompt_emb_delta_loss (`:1426-1480`) + calc_ref_cosine_loss
  (`:365-440`) — align (subj_comp − subj_single) with
  (cls_comp − cls_single) via ortho-subtract and masked cosine with a
  grad-scaled, demeaned reference.

Subject-token positions are passed as a mask `subj_mask [B, S]` rather than
index tuples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaface_tpu.ops.resize import resize_bilinear_half_pixel, resize_nearest
from adaface_tpu.utils.tensor import gen_gradient_scaler, ortho_subtract


def masked_mean(x: jax.Array, mask: jax.Array, eps: float = 1e-6) -> jax.Array:
    mask = mask.astype(jnp.float32)
    return (x.astype(jnp.float32) * mask).sum() / (mask.sum() + eps)


def calc_recon_loss(
    noise_pred: jax.Array,  # [B, C, H, W]
    noise_gt: jax.Array,
    img_mask: jax.Array | None = None,  # [B, 1, H, W]
    fg_mask: jax.Array | None = None,  # [B, 1, H, W]
    instance_weights: jax.Array | None = None,  # [B]
    fg_pixel_weight: float = 1.0,
    bg_pixel_weight: float = 1.0,
) -> jax.Array:
    """fg/bg-weighted masked MSE (`calc_recon_loss`)."""
    if img_mask is None:
        img_mask = jnp.ones_like(noise_pred[:, :1])
    if fg_mask is None:
        fg_mask = jnp.ones_like(noise_pred[:, :1])
    if instance_weights is not None:
        iw = instance_weights.reshape(-1, 1, 1, 1).astype(jnp.float32)
        fg_mask = fg_mask * iw
        img_mask = img_mask * iw
    err = (
        (noise_pred * img_mask).astype(jnp.float32)
        - (noise_gt * img_mask).astype(jnp.float32)
    ) ** 2
    w_fg = fg_mask * img_mask * fg_pixel_weight
    w_bg = (1.0 - fg_mask) * img_mask * bg_pixel_weight
    w_fg = jnp.broadcast_to(w_fg, err.shape)
    w_bg = jnp.broadcast_to(w_bg, err.shape)
    num = (err * w_fg).sum() + (err * w_bg).sum()
    den = w_fg.sum() + w_bg.sum() + 1e-6
    return num / den


def calc_subj_masked_bg_suppress_loss(
    ca_attn: dict[int, jax.Array],  # layer → [B, H, Nq, S] attn probs
    subj_mask: jax.Array | None,  # [B, S] subject-token positions
    fg_mask: jax.Array | None,  # [B, 1, h, w]
    layer_weights: dict[int, float] = {23: 0.5, 24: 0.5},
    bg_attn_tolerance: float = 0.02,
) -> jax.Array:
    """Suppress subject-token attention outside the fg mask
    (`calc_subj_masked_bg_suppress_loss`)."""
    if subj_mask is None or fg_mask is None or not ca_attn:
        return jnp.float32(0.0)
    total = jnp.float32(0.0)
    for layer, w in layer_weights.items():
        if layer not in ca_attn:
            continue
        attn = ca_attn[layer].astype(jnp.float32)  # [B, H, Nq, S]
        # sum attention over subject tokens → [B, H, Nq]
        subj_attn = (attn * subj_mask[:, None, None, :]).sum(-1)
        n = subj_attn.shape[-1]
        side = int(round(n ** 0.5))
        # reference resizes masks with mode="nearest|bilinear" — the
        # elementwise max of both — then binarizes at 1e-6, so any cell
        # partially overlapping the fg counts as fg
        # (`resize_mask_to_target_size`, `ldm/util.py:1333-1356`)
        fgf = fg_mask.astype(jnp.float32)
        fg = jnp.maximum(
            resize_nearest(fgf, (side, side)),
            resize_bilinear_half_pixel(fgf, (side, side),
                                       spatial_axes=(-2, -1)))
        fg = (fg.reshape(fg.shape[0], 1, n) > 1e-6).astype(jnp.float32)
        bg = 1.0 - fg
        excess = subj_attn * bg - bg_attn_tolerance
        total = total + w * masked_mean(excess, excess > 0)
    return total


def calc_recon_and_suppress_losses(
    noise_gt,
    noise_pred,
    noise_pred_cls,
    face_detected_inst_weights,
    ca_attn,
    subj_mask,
    img_mask,
    fg_mask,
    bg_pixel_weight: float,
    recon_on_pure_noise: bool = False,
):
    """→ (loss_recon, loss_recon_cls, loss_subj_mb_suppress)
    (`calc_recon_and_suppress_losses`)."""
    if recon_on_pure_noise:
        loss_recon = jnp.float32(0.0)
    else:
        loss_recon = calc_recon_loss(
            noise_pred, noise_gt, img_mask, fg_mask,
            instance_weights=face_detected_inst_weights,
            fg_pixel_weight=1.0, bg_pixel_weight=bg_pixel_weight,
        )
    if noise_pred_cls is not None:
        bg_mask = 1.0 - fg_mask if fg_mask is not None else None
        loss_recon_cls = calc_recon_loss(
            noise_pred, jax.lax.stop_gradient(noise_pred_cls), img_mask,
            bg_mask, instance_weights=face_detected_inst_weights,
            fg_pixel_weight=1.0, bg_pixel_weight=bg_pixel_weight,
        )
    else:
        loss_recon_cls = jnp.float32(0.0)
    loss_mb = calc_subj_masked_bg_suppress_loss(ca_attn, subj_mask, fg_mask)
    return loss_recon, loss_recon_cls, loss_mb


def demean(x: jax.Array) -> jax.Array:
    return x - x.mean(axis=-1, keepdims=True)


def calc_ref_cosine_loss(
    delta: jax.Array,  # [..., S, D]
    ref_delta: jax.Array,
    emb_mask: jax.Array | None = None,  # [..., S] weights (0 = excluded)
    exponent: float = 2.0,
    do_demeans=(False, False),
    ref_grad_scale: float = 0.0,
    aim_to_align: bool = True,
) -> jax.Array:
    """Masked cosine alignment against a grad-scaled reference
    (`calc_ref_cosine_loss`). Vectorized over all leading dims."""
    d = delta.astype(jnp.float32)
    r = ref_delta.astype(jnp.float32)
    if do_demeans[0]:
        d = demean(d)
    if do_demeans[1]:
        r = demean(r)
    r = gen_gradient_scaler(ref_grad_scale)(r)
    # sign-preserving power emphasis on the reference
    r_pow = r * jnp.abs(r) ** (exponent - 1.0)

    # eps inside the sqrt: tokens whose delta is exactly zero (identical
    # prompt prefixes, padding) would otherwise produce NaN grads through
    # norm(0) even when masked out downstream
    def safe_norm(x):
        return jnp.sqrt((x * x).sum(-1) + 1e-12)

    cos = (d * r_pow).sum(-1) / (safe_norm(d) * safe_norm(r_pow) + 1e-8)
    # torch F.cosine_embedding_loss: target +1 → 1-cos; target -1 →
    # max(0, cos - margin) with margin 0 (NOT 1+cos)
    per_tok = 1.0 - cos if aim_to_align else jax.nn.relu(cos)
    if emb_mask is not None:
        w = emb_mask.astype(jnp.float32)
        return (per_tok * w).sum() / (w.sum() + 1e-6)
    return per_tok.mean()


def calc_prompt_emb_delta_loss(
    prompt_embeddings: jax.Array,  # [4*B, S, D]: ss, sc, cs, cc blocks
    prompt_emb_mask: jax.Array | None = None,  # [4*B, S, 1]
    cls_delta_grad_scale: float = 0.05,
) -> jax.Array:
    """Align (subj_comp − subj_single) with (cls_comp − cls_single)
    (`calc_prompt_emb_delta_loss`)."""
    ss, sc, cs, cc = jnp.split(prompt_embeddings, 4, axis=0)
    if prompt_emb_mask is not None:
        m = prompt_emb_mask.astype(jnp.float32)
        m = m.at[:, 0].set(0.0)  # exclude BOS
        m_ss, m_sc, _, _ = jnp.split(m, 4, axis=0)
        agg = m_ss + m_sc
        weights = (agg ** 2 / 4.0)[..., 0]  # [B, S]
    else:
        weights = None
    subj_delta = ortho_subtract(sc, ss)
    cls_delta = ortho_subtract(cc, cs)
    return calc_ref_cosine_loss(
        subj_delta, cls_delta, emb_mask=weights,
        do_demeans=(False, True), ref_grad_scale=cls_delta_grad_scale,
        aim_to_align=True,
    )


def calc_attn_norm_loss(
    ca_attn_scores: dict[int, jax.Array],  # layer → [2B,H,Nq,S] (sc ‖ mc)
    subj_mask: jax.Array,  # [B, S]
    layer_weights: dict[int, float] = {23: 1.0, 24: 1.0},
) -> jax.Array:
    """Align subject-token attn-score norms between the sc and mc halves
    (`calc_attn_norm_loss`, `ldm/util.py:1756-1820` — used by comp
    distillation)."""
    if not ca_attn_scores:
        return jnp.float32(0.0)
    total, wsum = jnp.float32(0.0), 0.0
    for layer, w in layer_weights.items():
        if layer not in ca_attn_scores:
            continue
        score = ca_attn_scores[layer].astype(jnp.float32)
        sc, mc = jnp.split(score, 2, axis=0)
        m = subj_mask[:, None, None, :]
        sc_norm = (sc * m).sum(-1) / (m.sum(-1) + 1e-6)
        mc_norm = jax.lax.stop_gradient((mc * m).sum(-1) / (m.sum(-1) + 1e-6))
        total = total + w * ((sc_norm - mc_norm) ** 2).mean()
        wsum += w
    return total / max(wsum, 1e-6)
