import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.id2ada.teachers import UNetTeacher, create_unet_teacher
from adaface_tpu.models.unet import UNetConfig, init_unet_params
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.train.comp_losses import (
    calc_comp_subj_bg_preserve_loss,
    calc_elastic_matching_loss,
    calc_sc_rep_attn_distill_loss,
    calc_subj_attn_cross_t_diff_loss,
)
from adaface_tpu.train.comp_step import (
    CompDistillConfig,
    comp_distill_loss_fn,
    prime_comp_x_start,
)
from adaface_tpu.train.train_step import TrainConfig

from tests.test_train import CLIP_CFG, SBG_CFG, UNET_CFG, _setup, HW, K_ID, D


@pytest.fixture(scope="module")
def tiny_unet():
    return init_unet_params(jax.random.PRNGKey(0), UNET_CFG)


def test_teacher_multistep(tiny_unet):
    sched = DiffusionSchedule.create()
    teacher = UNetTeacher(unet_params=tiny_unet, unet_cfg=UNET_CFG)
    b = 2
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 4, HW, HW))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.array([800, 700])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (b, 8, D))
    preds, x_starts, noises, ts = teacher(
        sched, x0, noise, t, ctx, num_denoising_steps=3,
        rng=jax.random.PRNGKey(4))
    assert preds.shape == (3, b, 4, HW, HW)
    assert x_starts.shape == (4, b, 4, HW, HW)
    # timesteps strictly decrease along the chain
    ts_np = np.asarray(ts)
    assert (ts_np[1] < ts_np[0]).all() and (ts_np[2] < ts_np[1]).all()
    # teacher outputs carry no gradient
    def loss(params):
        teacher2 = UNetTeacher(unet_params=params, unet_cfg=UNET_CFG)
        p, *_ = teacher2(sched, x0, noise, t, ctx, num_denoising_steps=1,
                         rng=jax.random.PRNGKey(0))
        return (p ** 2).sum()
    g = jax.grad(loss)(tiny_unet)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)) == 0


def test_teacher_cfg_with_negative_context(tiny_unet):
    sched = DiffusionSchedule.create()
    teacher = create_unet_teacher("consistentID", unet_params=tiny_unet,
                                  unet_cfg=UNET_CFG)
    b = 1
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 4, HW, HW))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (b, 8, D))
    neg = jax.random.normal(jax.random.PRNGKey(4), (b, 8, D))
    preds, *_ = teacher(sched, x0, noise, jnp.array([500]), ctx,
                        negative_context=neg, num_denoising_steps=2,
                        cfg_scale=1.5, rng=jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(preds)).all()
    # cfg plan sampling
    rs = np.random.RandomState(0)
    scales = {teacher.sample_cfg_scale(rs) for _ in range(20)}
    assert 1.0 in scales and any(s > 1.0 for s in scales)


def test_teacher_ensemble(tiny_unet):
    sched = DiffusionSchedule.create()
    p2 = init_unet_params(jax.random.PRNGKey(9), UNET_CFG)
    teacher = create_unet_teacher(
        "unet_ensemble", unet_params=[tiny_unet, p2], unet_cfg=UNET_CFG,
        unet_weights=[0.7, 0.3])
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, HW, HW))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 8, D))
    preds, *_ = teacher(sched, x0, noise, jnp.array([500]), ctx,
                        num_denoising_steps=1, rng=jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(preds)).all()


def _fake_capture(b=1, c=16, hw=8, heads=2, s=12, seed=0):
    rs = jax.random.PRNGKey(seed)
    n = hw * hw
    keys = jax.random.split(rs, 8)
    cap = {
        "q2": {24: jax.random.normal(keys[0], (4 * b, c, n))},
        "attn_out": {24: jax.random.normal(keys[1], (4 * b, c, n))},
        "outfeat": {24: jax.random.normal(keys[2], (4 * b, c, hw, hw))},
        "attn": {24: jax.nn.softmax(
            jax.random.normal(keys[3], (4 * b, heads, n, s)), -1)},
        "attnscore": {24: jax.random.normal(keys[4], (4 * b, heads, n, s))},
        "k": {24: jax.random.normal(keys[5], (4 * b, c, s))},
        "v": {24: jax.random.normal(keys[6], (4 * b, c, s))},
    }
    return cap


def test_elastic_matching_loss_shapes_and_grads():
    cap = _fake_capture()
    hw = 8
    bbox = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])
    q = cap["q2"][24]

    # min-recon loss: gradients flow through the *features* (with random
    # features the x10 attn margin makes sameloc win, so q gets no grad
    # through this term — matching the reference margin design)
    def loss_feat(feat):
        losses = calc_elastic_matching_loss(
            q, feat, cap["outfeat"][24].reshape(4, 16, 64), hw, hw, bbox, bbox)
        return losses["sc_recon_ssfg_min"] + losses["sc_recon_mc_min"]

    val, g = jax.value_and_grad(loss_feat)(cap["attn_out"][24])
    assert np.isfinite(float(val))
    g_blocks = np.split(np.asarray(g), 4, axis=0)
    assert np.abs(g_blocks[1]).sum() > 0  # sc block gets grads
    assert np.abs(g_blocks[0]).sum() == 0  # ss targets are stop_gradded

    # sparse-attn distillation: gradients flow through q (the attn matrix)
    def loss_q(q):
        losses = calc_elastic_matching_loss(
            q, cap["attn_out"][24],
            cap["outfeat"][24].reshape(4, 16, 64), hw, hw, bbox, bbox)
        return (losses["sc_to_ssfg_sparse_attns_distill"]
                + losses["sc_to_mc_sparse_attns_distill"])

    val2, gq = jax.value_and_grad(loss_q)(q)
    assert np.isfinite(float(val2))
    assert np.abs(np.asarray(gq)).sum() > 0


def test_elastic_matching_with_flow():
    """Flow-enabled elastic matching (`--use_face_flow_for_sc_matching_
    loss`): an identity flow must make the flow candidate equal sameloc,
    and a constant-shift flow must warp the recon accordingly; flow2attn
    columns stay normalized."""
    from adaface_tpu.models.gma import backward_warp_by_flow, flow2attn

    cap = _fake_capture()
    hw = 8
    n = hw * hw
    bbox = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])
    q = cap["q2"][24]
    feat = cap["attn_out"][24]
    outfeat = cap["outfeat"][24].reshape(4, 16, n)

    def zero_flow(tgt, src, h, w, thres=0.0):
        return jnp.zeros((tgt.shape[0], 2, h, w))

    base = calc_elastic_matching_loss(q, feat, outfeat, hw, hw, bbox, bbox)
    with_flow = calc_elastic_matching_loss(
        q, feat, outfeat, hw, hw, bbox, bbox, flow_fn=zero_flow)
    # identity flow == sameloc candidate → identical min-recon losses
    np.testing.assert_allclose(
        float(with_flow["sc_recon_ssfg_min"]),
        float(base["sc_recon_ssfg_min"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(with_flow["sc_recon_ssfg_flow"]),
        float(with_flow["sc_recon_ssfg_sameloc"]), rtol=1e-5)

    # flow2attn: identity flow → identity attn; attn columns normalized
    fa = flow2attn(jnp.zeros((1, 2, hw, hw)), hw, hw)
    np.testing.assert_allclose(np.asarray(fa[0]), np.eye(n), atol=1e-6)
    shift = jnp.zeros((1, 2, hw, hw)).at[:, 0].set(1.0)  # dx=1
    fa_s = flow2attn(shift, hw, hw)
    np.testing.assert_allclose(np.asarray(fa_s.sum(1)).max(), 1.0, atol=1e-5)
    # warping a feature by the flow equals aggregating with flow2attn
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 5, hw, hw))
    warped = backward_warp_by_flow(img, shift).reshape(1, 5, n)
    agg = jnp.einsum("bcn,bnm->bcm", img.reshape(1, 5, n), fa_s)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(agg),
                               atol=1e-5)


def test_preserve_loss_with_gma_flow():
    """calc_comp_subj_bg_preserve_loss with the real GMA latent-flow fn
    (make_latent_flow_fn) — finite loss, grads still flow to features."""
    from adaface_tpu.models.gma import init_gma_params, make_latent_flow_fn
    from adaface_tpu.train.comp_losses import calc_comp_subj_bg_preserve_loss

    cap = _fake_capture()
    gma = init_gma_params(jax.random.PRNGKey(0))
    flow_fn = make_latent_flow_fn(gma, num_iters=2)
    bbox = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])

    def loss(feat):
        cap2 = dict(cap, attn_out={24: feat})
        total, _ = calc_comp_subj_bg_preserve_loss(
            cap2, bbox, bbox, flow_fn=flow_fn,
            layer_weights={24: 1.0})
        return total

    val, g = jax.value_and_grad(loss)(cap["attn_out"][24])
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.split(np.asarray(g), 4, axis=0)[1]).sum() > 0


def test_comp_subj_bg_preserve_loss():
    cap = _fake_capture()
    bbox = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])
    loss, metrics = calc_comp_subj_bg_preserve_loss(
        cap, bbox, bbox, layer_weights={24: 1.0})
    assert np.isfinite(float(loss))
    assert "l24_sc_recon_ssfg_min" in metrics


def test_rep_distill_gating():
    cap = _fake_capture()
    s = 12
    subj = jnp.zeros((1, s)).at[:, 3:6].set(1.0)
    emb = jnp.ones((4, s, 1))
    pad = jnp.zeros((4, s, 1))
    on = calc_sc_rep_attn_distill_loss(cap, subj, emb, pad, 0.5,
                                       layer_weights={24: 1.0})
    off = calc_sc_rep_attn_distill_loss(cap, subj, emb, pad, 0.05,
                                        layer_weights={24: 1.0})
    assert float(sum(on.values())) > 0
    assert float(sum(off.values())) == 0  # below FG_THRES → gated off


def test_cross_t_diff_loss():
    a, b_ = _fake_capture(seed=0), _fake_capture(seed=1)
    subj = jnp.zeros((1, 12)).at[:, 2:5].set(1.0)  # [B, S] 1-block mask
    loss = calc_subj_attn_cross_t_diff_loss(a, b_, subj,
                                            layer_weights={24: 1.0})
    assert float(loss) > 0
    same = calc_subj_attn_cross_t_diff_loss(a, a, subj,
                                            layer_weights={24: 1.0})
    assert float(same) < 1e-9


def make_comp_batch(b=2, hw=HW):
    """5-block comp batch [ss ‖ sc ‖ sc_rep ‖ cs ‖ cc] on the tiny stack."""
    from adaface_tpu.text.embedding_manager import EmbeddingManager, PlaceholderSpec
    from adaface_tpu.text.tokenizer import CLIPTokenizer
    from adaface_tpu.train.prompt_batch import (
        build_comp_prompt_batch, make_comp_rep_prompts)

    tok = CLIPTokenizer.character_fallback()
    em = EmbeddingManager(tok, [PlaceholderSpec("z", K_ID)])
    ph = em.expand_placeholder(em.placeholders[0])
    ss = [f"a photo of {ph}"] * b
    sc = [f"a photo of {ph} riding a bike"] * b
    sc_rep = make_comp_rep_prompts(sc, ["cinematic"] * b,
                                   ["riding a bike"] * b)
    cs = ["a photo of person"] * b
    cc = ["a photo of person riding a bike"] * b
    pb = build_comp_prompt_batch(em, ss, sc, sc_rep, cs, cc)

    key = jax.random.PRNGKey(42)
    return {
        "x_start": jax.random.normal(jax.random.fold_in(key, 0), (b, 4, hw, hw)),
        "noise": jax.random.normal(jax.random.fold_in(key, 1), (b, 4, hw, hw)),
        "img_prompt_embs": jax.random.normal(jax.random.fold_in(key, 2),
                                             (b, K_ID, D)),
        "prompt_ids": jnp.asarray(pb["prompt_ids"]),
        "splice_map": jnp.asarray(pb["splice_map"]),
        "prompt_emb_mask": jnp.asarray(pb["prompt_emb_mask"]),
        "prompt_pad_mask": jnp.asarray(pb["prompt_pad_mask"]),
        "uncond_ids": jnp.asarray(pb["uncond_ids"]),
        "fg_mask": jnp.ones((b, 1, hw, hw)).at[:, :, :, hw // 2:].set(0.0),
        "ss_face_bboxes": jnp.asarray([[2.0, 2.0, 12.0, 12.0]] * b),
        "sc_face_bboxes": jnp.asarray([[2.0, 2.0, 12.0, 12.0]] * b),
        "sc_fg_mask_percent": jnp.float32(0.4),
    }


def test_comp_distill_loss_fn_end_to_end():
    frozen, trainable, _ = _setup(b=2)
    batch = make_comp_batch(b=2)
    sched = DiffusionSchedule.create()
    cfg = TrainConfig(unet=UNET_CFG, sbg=SBG_CFG, clip_text=CLIP_CFG)
    comp_cfg = CompDistillConfig(num_priming_steps=1, num_denoising_steps=2)

    (loss, metrics), grads = jax.value_and_grad(
        comp_distill_loss_fn, has_aux=True)(
        trainable, frozen, batch, sched, cfg, jax.random.PRNGKey(0),
        comp_cfg)
    assert np.isfinite(float(loss))
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads))
    assert g > 0
    for k in ("loss_comp_fg_bg_preserve", "loss_rep_distill",
              "loss_cross_t_diff"):
        assert np.isfinite(float(metrics[k])), k


def test_comp_distill_per_block_grad_gating():
    """Only the SC block's captured activations carry gradients back to
    the ada path (the reference's sliced enable_grad calls,
    `guided_denoise`, `ddpm.py:1630-1712`)."""
    frozen, trainable, _ = _setup(b=1)
    batch = make_comp_batch(b=1)
    sched = DiffusionSchedule.create()
    cfg = TrainConfig(unet=UNET_CFG, sbg=SBG_CFG, clip_text=CLIP_CFG)
    comp_cfg = CompDistillConfig(num_priming_steps=1, num_denoising_steps=1)
    from adaface_tpu.train.comp_step import (
        comp_distill_denoise, encode_comp_prompts, sample_comp_rand)
    from adaface_tpu.train.train_step import compute_ada_embs

    def per_block_sums(trainable):
        ada = compute_ada_embs(trainable, frozen,
                               batch["img_prompt_embs"][:1], cfg)
        ctx = encode_comp_prompts(frozen, ada, batch, cfg)
        r = comp_cfg.cls_subj_mix_ratio
        cc_mix = ctx["sc"] * (1 - r) + ctx["cc"] * r
        ctx4 = jnp.concatenate([ctx["ss"], ctx["sc"], ctx["sr"], cc_mix], 0)
        rand = sample_comp_rand(jax.random.PRNGKey(3), batch["noise"],
                                sched, comp_cfg)
        splice4 = jnp.concatenate([batch["splice_map"][:3],
                                   batch["splice_map"][4:5]], 0)
        subj_mask4 = (splice4 >= 0).astype(jnp.float32)
        x4 = jnp.tile(batch["noise"], (4, 1, 1, 1))
        caps, recons, _, _ = comp_distill_denoise(
            frozen["unet"], cfg.unet, sched, x4, ctx4, ctx["uncond"],
            subj_mask4, rand, cfg=comp_cfg)
        out = caps[-1]["attn_out"][24]
        ss, sc, sr, mc = jnp.split(out, 4, axis=0)
        return {"ss": (ss ** 2).sum(), "sc": (sc ** 2).sum(),
                "sr": (sr ** 2).sum(), "mc": (mc ** 2).sum()}

    grads = {k: jax.grad(lambda tr, k=k: per_block_sums(tr)[k])(trainable)
             for k in ("ss", "sc", "sr", "mc")}

    def gsum(g):
        return sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(g))

    assert gsum(grads["sc"]) > 0
    assert gsum(grads["ss"]) == 0
    assert gsum(grads["sr"]) == 0
    assert gsum(grads["mc"]) == 0
