"""Stage-2 compositional-distillation losses.

JAX rebuilds of the comp-distill loss family (`ldm/util.py:1920-2758`,
dispatched from `calc_comp_feat_distill_loss`, `ddpm.py:3190-3600`). The
4-block batch layout everywhere is [subj_single ‖ subj_comp ‖
subj_comp_rep ‖ cls_comp] along the leading axis.

- elastic matching (`calc_elastic_matching_loss:2549-2758` +
  `calc_sc_recon_ssfg_mc_losses:2314-2548`): reconstruct subject-comp
  features from subject-single-fg and cls-comp features via (a) q-similarity
  attention aggregation, (b) optical flow (pluggable; same-location mock
  when absent, as in the reference default), (c) same-location, taking the
  margin-weighted per-token min, with loss-scale capping/discard expressed
  as jnp.where gates (no data-dependent python control flow).
- `calc_comp_subj_bg_preserve_loss:1920-2046`: layer-weighted wrapper over
  the captured CA layers 22/23/24.
- `calc_sc_rep_attn_distill_loss:2047-2122`: subj-comp → subj-comp-rep
  attention distillation + subject-K/V alignment to subj-single and
  non-subject-K/V alignment to cls-comp, gated on the detected-face area
  fraction.
- `calc_subj_attn_cross_t_diff_loss:2123-…`: subject-attention consistency
  across consecutive denoising steps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

LayerActs = dict[int, jax.Array]


def _crop_resize_feat(feat_4d: jax.Array, bboxes: jax.Array) -> jax.Array:
    """[B,C,H,W] + latent-space bboxes [B,4] (x0,y0,x1,y1) → crops resized
    back to [B,C,H,W]. Matches the reference's integer-box slice +
    `F.interpolate(mode='bilinear', align_corners=False)`
    (`ldm/util.py:2576-2586`): sample centers (i+0.5)·crop/H − 0.5,
    border-replicated inside the crop."""
    b, c, h, w = feat_4d.shape
    x0, y0, x1, y1 = [bboxes[:, i].astype(jnp.float32) for i in range(4)]
    cw = jnp.maximum(x1 - x0, 1.0)
    ch = jnp.maximum(y1 - y0, 1.0)
    ty = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None] * (ch[:, None] / h) - 0.5
    tx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None] * (cw[:, None] / w) - 0.5
    ys = y0[:, None] + jnp.clip(ty, 0.0, (ch - 1.0)[:, None])  # [B, H]
    xs = x0[:, None] + jnp.clip(tx, 0.0, (cw - 1.0)[:, None])
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)

    y0i = jnp.floor(ys).astype(jnp.int32)
    x0i = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    wy = (ys - y0i)[:, None, :, None]
    wx = (xs - x0i)[:, None, None, :]

    def per_image(img, yia, yib, xia, xib):
        g00 = img[:, yia, :][:, :, xia]
        g01 = img[:, yia, :][:, :, xib]
        g10 = img[:, yib, :][:, :, xia]
        g11 = img[:, yib, :][:, :, xib]
        return g00, g01, g10, g11

    g00, g01, g10, g11 = jax.vmap(per_image)(feat_4d, y0i, y1i, x0i, x1i)
    return (g00 * (1 - wy) * (1 - wx) + g01 * (1 - wy) * wx
            + g10 * wy * (1 - wx) + g11 * wy * wx)


def _recon_with_attn(feat: jax.Array, prob: jax.Array) -> jax.Array:
    """[B,C,N] × [B,N,N'] → [B,N',C] (`reconstruct_feat_with_attn_aggregation`)."""
    return jnp.einsum("bcn,bnm->bmc", feat, prob)


def calc_elastic_matching_loss(
    ca_q: jax.Array,  # [4B, C, N] (q2 capture)
    ca_attn_out: jax.Array,  # [4B, C, N]
    ca_outfeat: jax.Array,  # [4B, C, N]
    h: int,
    w: int,
    ss_face_bboxes: jax.Array,  # [B, 4] latent coords
    sc_face_bboxes: jax.Array,  # [B, 4]
    # flow_fn(target_q [B,C,N], src_q [B,C,N], h, w, small_motion_thres)
    # → target→src flow [B,2,h,w] (GMA `est_flow_from_feats`; see
    # make_latent_flow_fn). None = sameloc mock, the reference default
    # (`use_face_flow_for_sc_matching_loss=False`, `main.py:261-262`).
    flow_fn: Callable | None = None,
    small_motion_ignore_thres: float = 0.3,
    sc_face_shrink_ratio: float = 1.0,
    recon_scaled_loss_threses={"mc": 0.4, "ssfg": 0.4},
    recon_max_scale_of_threses: float = 5.0,
):
    """→ dict of losses: sc_recon_{ssfg,mc}_{attn_agg,flow,sameloc,min},
    sc_to_{ssfg,mc}_sparse_attns_distill, discarded_loss_ratio."""
    b4, c, n = ca_q.shape
    b = b4 // 4
    ss_q, sc_q, sc_rep_q, mc_q = jnp.split(ca_q, 4, axis=0)

    def to4d(x):
        return x.reshape(x.shape[0], c, h, w)

    # fg crops resized to full grid, demeaned for sharper matching
    ssfg_q = _crop_resize_feat(to4d(ss_q), ss_face_bboxes).reshape(b, c, n)
    scfg_q = _crop_resize_feat(to4d(sc_q), sc_face_bboxes).reshape(b, c, n)
    q_fg_mean = jax.lax.stop_gradient(
        jnp.concatenate([ssfg_q, scfg_q], 0).mean(axis=(0, 2), keepdims=True))
    ssfg_q = ssfg_q - q_fg_mean
    scfg_q = scfg_q - q_fg_mean

    # bg mask: 1 outside the (possibly shrunken) sc face box
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    x0, y0, x1, y1 = [sc_face_bboxes[:, i, None, None] * sc_face_shrink_ratio
                      for i in range(4)]
    in_face = ((xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1))
    sc_bg_mask = 1.0 - in_face.astype(jnp.float32)  # [B, H, W]
    sc_bg_mask_3d = sc_bg_mask.reshape(b, 1, n)

    scbg_q = sc_q * sc_bg_mask_3d
    bg_frac = sc_bg_mask_3d.sum() / (b * n) + 1e-5
    q_bg_mean = jax.lax.stop_gradient(
        (mc_q.mean(axis=(0, 2), keepdims=True)
         + scbg_q.mean(axis=(0, 2), keepdims=True) / bg_frac) / 2.0)
    mc_q = mc_q - q_bg_mean
    scbg_q = (scbg_q - q_bg_mean) * sc_bg_mask_3d

    # matching probabilities, normalized over the sc-token dim
    sc_attns = {
        "ssfg": jax.nn.softmax(
            jnp.einsum("bcn,bcm->bnm", scfg_q, ssfg_q), axis=1),
        "mc": jax.nn.softmax(
            jnp.einsum("bcn,bcm->bnm", scbg_q, mc_q), axis=1),
    }
    eye = jnp.broadcast_to(jnp.eye(n), (b, n, n))

    # flows estimated ONCE per call from the (demeaned, cropped) q features
    # and reused across outfeat/attn_out, like the reference threads
    # ss2sc_flow/mc2sc_flow through `calc_sc_recon_ssfg_mc_losses`
    # (`ldm/util.py:2352-2372`)
    flows = flow_attns = None
    if flow_fn is not None:
        from adaface_tpu.models.gma import backward_warp_by_flow, flow2attn

        flows = {
            "ssfg": jax.lax.stop_gradient(flow_fn(ssfg_q, scfg_q, h, w, 0.0)),
            "mc": jax.lax.stop_gradient(
                flow_fn(mc_q, scbg_q, h, w, small_motion_ignore_thres)),
        }
        flow_attns = {k: flow2attn(v, h, w) for k, v in flows.items()}

    losses: dict[str, jax.Array] = {}
    discard_flags = []
    for name in ("ssfg", "mc"):
        losses[f"sc_to_{name}_sparse_attns_distill"] = jnp.float32(0.0)

    # margins from the reference (`:2455-2463`)
    margins = {"ssfg": (10.0, 1.02), "mc": (10.0, 1.1)}

    accum: dict[str, list] = {}
    for feat_type, feat_obj in (("outfeat", ca_outfeat), ("attn_out", ca_attn_out)):
        ss_f, sc_f, _, mc_f = jnp.split(feat_obj, 4, axis=0)
        ssfg_f = _crop_resize_feat(to4d(ss_f), ss_face_bboxes).reshape(b, c, n)
        scfg_f = _crop_resize_feat(to4d(sc_f), sc_face_bboxes).reshape(b, c, n)
        f_fg_mean = jax.lax.stop_gradient(
            jnp.concatenate([ssfg_f, scfg_f], 0).mean(axis=(0, 2), keepdims=True))
        ssfg_f = ssfg_f - f_fg_mean
        scfg_f = scfg_f - f_fg_mean
        scbg_f = sc_f * sc_bg_mask_3d
        f_bg_mean = jax.lax.stop_gradient(
            (mc_f.mean(axis=(0, 2), keepdims=True)
             + scbg_f.mean(axis=(0, 2), keepdims=True) / bg_frac) / 2.0)
        mc_f = mc_f - f_bg_mean
        scbg_f = (scbg_f - f_bg_mean) * sc_bg_mask_3d

        srcs = {"ssfg": scfg_f, "mc": scbg_f}
        targets = {"ssfg": jax.lax.stop_gradient(ssfg_f),
                   "mc": jax.lax.stop_gradient(mc_f)}

        for name in ("ssfg", "mc"):
            target = targets[name].transpose(0, 2, 1)  # [B, N, C]
            if flows is not None:
                # `reconstruct_feat_with_matching_flow`: warp the src feat
                # onto the target layout by the target→src flow
                flow_recon = backward_warp_by_flow(
                    srcs[name].reshape(b, c, h, w), flows[name]
                ).reshape(b, c, n).transpose(0, 2, 1)
            else:
                # sameloc mock — margins effectively disable the candidate
                flow_recon = srcs[name].transpose(0, 2, 1)
            cands = {
                "attn_agg": _recon_with_attn(srcs[name], sc_attns[name]),
                "flow": flow_recon,
                "sameloc": srcs[name].transpose(0, 2, 1),
            }
            token_losses = {
                k: ((v - target) ** 2).mean(-1) for k, v in cands.items()
            }  # each [B, N]
            m_attn, m_flow = margins[name]
            stacked = jnp.stack([
                token_losses["attn_agg"] * m_attn,
                token_losses["flow"] * m_flow,
                token_losses["sameloc"],
            ], axis=0)  # [3, B, N]
            min_tok = stacked.min(axis=0)
            loss_min = min_tok.mean()

            # sparse-attn distillation: teach the attn toward the better
            # sparse scheme, weighted by its (detached) advantage
            adv = jax.lax.stop_gradient(
                stacked[0:1] - stacked[1:])  # [2, B, N]
            adv_best = adv.max(axis=0)  # [B, N]
            adv_n = (adv_best - adv_best.mean(-1, keepdims=True)) / (
                adv_best.std(-1, keepdims=True) + 1e-5)
            weights = jax.nn.sigmoid(5.0 * adv_n)[:, None, :]  # [B,1,N]
            if flow_attns is not None:
                # per-target-token selection between the flow-warped attn
                # and sameloc (`gather` on max advantage, `ldm/util.py:
                # 2484-2491`); columns stay normalized over sc tokens
                pick_flow = (adv[0] >= adv[1])[:, None, :]  # [B,1,N]
                sparse_attn = jnp.where(pick_flow, flow_attns[name], eye)
            else:
                sparse_attn = eye  # both sparse schemes are identity w/o flow
            ens = sparse_attn + sc_attns[name]
            w_sc = jax.lax.stop_gradient(
                jnp.einsum("bon,bmn->bom", weights, ens)).transpose(0, 2, 1)
            loss_sparse = (jnp.abs(sparse_attn - sc_attns[name])
                           * w_sc).mean()

            # loss-scale capping + discard gating (`:2706-2737`)
            thres = recon_scaled_loss_threses[name]
            raw = jax.lax.stop_gradient(loss_min)
            keep = (raw < thres * recon_max_scale_of_threses).astype(jnp.float32)
            scale = jnp.minimum(thres / (raw + 1e-6), 1.0) * keep
            discard_flags.append(1.0 - keep)

            for k in ("attn_agg", "flow", "sameloc"):
                accum.setdefault(f"sc_recon_{name}_{k}", []).append(
                    token_losses[k].mean() * scale)
            accum.setdefault(f"sc_recon_{name}_min", []).append(loss_min * scale)
            accum.setdefault(f"sc_to_{name}_sparse_attns_distill", []).append(
                loss_sparse)

    for k, vals in accum.items():
        losses[k] = sum(vals) / len(vals)
    losses["discarded_loss_ratio"] = sum(discard_flags) / len(discard_flags)
    return losses


def calc_comp_subj_bg_preserve_loss(
    ca_layers_activations: dict[str, LayerActs],  # needs q2/attn_out/outfeat
    ss_face_bboxes: jax.Array,
    sc_face_bboxes: jax.Array,
    flow_fn: Callable | None = None,
    small_motion_ignore_thres: float = 0.3,
    layer_weights: dict[int, float] = {22: 1 / 3, 23: 1 / 3, 24: 1 / 3},
    sc_recon_ssfg_loss_scale: float = 0.1,
    sc_recon_mc_loss_scale: float = 0.2,
    do_sc_fg_faces_suppress: "jax.Array | float" = 0.0,
    sc_face_shrink_ratio: "jax.Array | float" = 1.0,
):
    """→ (loss_comp_fg_bg_preserve, metrics dict).

    do_sc_fg_faces_suppress may be a traced {0,1} gate (the reference's
    branch zeroes the ssfg term, `ldm/util.py:1987-1990` via
    `ddpm.py:3429-3462`); sc_face_shrink_ratio shrinks the sc face box
    for the bg-matching mask (`sc_face_shrink_ratio_for_bg_matching_mask`,
    `ddpm.py:3456,3462`)."""
    gate = jnp.asarray(do_sc_fg_faces_suppress, jnp.float32)
    ssfg_scale = sc_recon_ssfg_loss_scale * (1.0 - gate)
    total = jnp.float32(0.0)
    metrics: dict[str, jax.Array] = {}
    qs = ca_layers_activations["q2"]
    attn_outs = ca_layers_activations["attn_out"]
    outfeats = ca_layers_activations["outfeat"]
    for layer, w in layer_weights.items():
        if layer not in qs:
            continue
        q = qs[layer]
        outfeat = outfeats[layer]
        if outfeat.ndim == 4:  # [4B, C, H, W] → [4B, C, N]
            hh, ww = outfeat.shape[-2:]
            outfeat = outfeat.reshape(*outfeat.shape[:2], -1)
        else:
            n = outfeat.shape[-1]
            hh = ww = int(round(n ** 0.5))
        losses = calc_elastic_matching_loss(
            q, attn_outs[layer], outfeat, hh, ww,
            ss_face_bboxes, sc_face_bboxes, flow_fn=flow_fn,
            small_motion_ignore_thres=small_motion_ignore_thres,
            sc_face_shrink_ratio=sc_face_shrink_ratio)
        total = total + w * (
            losses["sc_recon_ssfg_min"] * ssfg_scale
            + losses["sc_recon_mc_min"] * sc_recon_mc_loss_scale)
        for k, v in losses.items():
            metrics[f"l{layer}_{k}"] = v
    return total, metrics


def calc_dyn_loss_scale(
    loss: "jax.Array | float",
    base_loss_and_scale: tuple[float, float],
    ref_loss_and_scale: tuple[float, float],
    valid_scale_range: tuple[float, float] = (0.0, 100.0),
) -> jax.Array:
    """Linear loss→scale interpolation (`calc_dyn_loss_scale`,
    `ldm/util.py:1485-1520`), jittable."""
    base_loss, base_scale = base_loss_and_scale
    ref_loss, ref_scale = ref_loss_and_scale
    rel = (jnp.asarray(loss, jnp.float32) - base_loss) / (ref_loss - base_loss)
    scale = rel * (ref_scale - base_scale) + base_scale
    return jnp.clip(scale, valid_scale_range[0], valid_scale_range[1])


def calc_sc_rep_attn_distill_loss(
    ca_layers_activations: dict[str, LayerActs],  # attn [4B,H,Nq,S], k/v [4B,C,S]
    subj_mask_1b: jax.Array,  # [1or B, S] subject-token positions
    prompt_emb_mask_4b: jax.Array,  # [4B, S, 1]
    prompt_pad_mask_4b: jax.Array,  # [4B, S, 1]
    sc_fg_mask_percent: jax.Array | float,
    fg_thres: float = 0.1,
    layer_weights: dict[int, float] = {23: 0.5, 24: 0.5},
):
    """→ dict of the 5 rep-distill losses (`calc_sc_rep_attn_distill_loss`).
    All losses gate to 0 when the detected face area < fg_thres."""
    gate = (jnp.asarray(sc_fg_mask_percent) >= fg_thres).astype(jnp.float32)

    emb = prompt_emb_mask_4b[..., 0]
    pad = prompt_pad_mask_4b[..., 0]
    _, sc_emb, _, _ = jnp.split(emb, 4, axis=0)
    _, sc_pad, _, _ = jnp.split(pad, 4, axis=0)
    subj = subj_mask_1b.astype(jnp.float32)
    nonsubj = jnp.clip(sc_emb * (1.0 - subj) + sc_pad, 0.0, 1.0)[:, None, :]

    out = {k: jnp.float32(0.0) for k in (
        "subj_attn", "subj_k", "nonsubj_k", "subj_v", "nonsubj_v")}
    for layer, w in layer_weights.items():
        attns = ca_layers_activations["attn"]
        if layer not in attns:
            continue
        attn = attns[layer]  # [4B, H, Nq, S]
        s = attn.shape[-1]
        _, sc_attn, sc_rep_attn, _ = jnp.split(attn, 4, axis=0)
        loss_attn = ((sc_attn - jax.lax.stop_gradient(sc_rep_attn)) ** 2).mean()
        out["subj_attn"] = out["subj_attn"] + loss_attn * (s * 10) * w

        k4 = ca_layers_activations["k"][layer]  # [4B, C, S]
        v4 = ca_layers_activations["v"][layer]
        ss_k, sc_k, _, mc_k = jnp.split(k4, 4, axis=0)
        ss_v, sc_v, _, mc_v = jnp.split(v4, 4, axis=0)

        def masked_mse(a, b, m):
            d = (a - jax.lax.stop_gradient(b)) ** 2
            m = jnp.broadcast_to(m, d.shape)
            return (d * m).sum() / (m.sum() + 1e-6)

        sm = subj[:, None, :]
        out["subj_k"] = out["subj_k"] + masked_mse(sc_k, ss_k, sm) * w
        out["subj_v"] = out["subj_v"] + masked_mse(sc_v, ss_v, sm) * w
        out["nonsubj_k"] = out["nonsubj_k"] + masked_mse(sc_k, mc_k, nonsubj) * w
        out["nonsubj_v"] = out["nonsubj_v"] + masked_mse(sc_v, mc_v, nonsubj) * w
    return {k: v * gate for k, v in out.items()}


def calc_subj_attn_cross_t_diff_loss(
    ca_layers_activations: dict[str, LayerActs],
    future_ca_layers_activations: dict[str, LayerActs],
    subj_mask_1b: jax.Array,  # [B, S] subject-token positions
    layer_weights: dict[int, float] = {23: 0.5, 24: 0.5},
):
    """Subject-attention consistency across consecutive denoising steps
    (`calc_subj_attn_cross_t_diff_loss`, `ldm/util.py:2123-2146`): MSE of
    the subj-comp block's subject-token attention columns against the next
    step's (detached), ×10, layer-weighted. NOTE the reference computes
    this as a monitor only — its contribution to the total loss is
    disabled (`ddpm.py:3553-3556`)."""
    total = jnp.float32(0.0)
    m = subj_mask_1b.astype(jnp.float32)[:, None, None, :]  # [B,1,1,S]
    for layer, w in layer_weights.items():
        cur = ca_layers_activations["attn"].get(layer)
        fut = future_ca_layers_activations["attn"].get(layer)
        if cur is None or fut is None:
            continue
        _, sc, _, _ = jnp.split(cur, 4, axis=0)
        _, sc2, _, _ = jnp.split(fut, 4, axis=0)
        d = (sc - jax.lax.stop_gradient(sc2)) ** 2  # [B,H,Nq,S]
        mm = jnp.broadcast_to(m, d.shape)
        total = total + w * 10.0 * (d * mm).sum() / (mm.sum() + 1e-6)
    return total
