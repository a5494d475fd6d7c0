"""Golden parity for the loss library against the reference `ldm.util`.

The reference module imports with torchvision stubbed; each test feeds
identical numpy inputs to both implementations. Reduction conventions:
the reference normalizes the masked cosine per sample then averages over
the batch, ours is a global weighted mean — identical for B=1, which is
what these tests use (the per-sample order is covered by the reference's
own batching, not a semantic we need to mirror for B=1 training blocks).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from adaface_tpu.train.losses import (
    calc_prompt_emb_delta_loss,
    calc_recon_loss,
    calc_ref_cosine_loss,
    ortho_subtract,
)


@pytest.fixture(scope="module")
def ref_util():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.draw_bounding_boxes = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    try:
        import ldm.util as lu
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    return lu


def test_ortho_subtract_matches(ref_util):
    rs = np.random.RandomState(0)
    a = rs.randn(2, 5, 16).astype(np.float32)
    b = rs.randn(2, 5, 16).astype(np.float32)
    want = ref_util.ortho_subtract(torch.from_numpy(a),
                                   torch.from_numpy(b)).numpy()
    got = np.asarray(ortho_subtract(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # residual ⊥ b
    assert np.abs((got * b).sum(-1)).max() < 1e-3
    # b_discount scaling
    want_d = ref_util.ortho_subtract(torch.from_numpy(a),
                                     torch.from_numpy(b),
                                     b_discount=0.5).numpy()
    got_d = np.asarray(ortho_subtract(jnp.asarray(a), jnp.asarray(b),
                                      b_discount=0.5))
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)


def test_ref_cosine_loss_matches(ref_util):
    rs = np.random.RandomState(1)
    d = rs.randn(1, 7, 16).astype(np.float32)
    r = rs.randn(1, 7, 16).astype(np.float32)
    mask = (rs.rand(1, 7, 1) > 0.3).astype(np.float32)
    for demeans in ([False, False], [False, True], [True, True]):
        for aim in (True, False):
            want = float(ref_util.calc_ref_cosine_loss(
                torch.from_numpy(d), torch.from_numpy(r),
                emb_mask=torch.from_numpy(mask), do_demeans=demeans,
                first_n_dims_into_instances=2, ref_grad_scale=0.05,
                aim_to_align=aim))
            got = float(calc_ref_cosine_loss(
                jnp.asarray(d), jnp.asarray(r),
                emb_mask=jnp.asarray(mask[..., 0]),
                do_demeans=tuple(demeans), ref_grad_scale=0.05,
                aim_to_align=aim))
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"{demeans} {aim}")


def test_prompt_emb_delta_loss_matches(ref_util):
    rs = np.random.RandomState(2)
    embs = rs.randn(4, 9, 16).astype(np.float32)
    mask = np.ones((4, 9, 1), np.float32)
    mask[1, 6:] = 0  # comp prompt longer than single; pad differences
    mask[3, 6:] = 0
    mask[0, 4:] = 0
    mask[2, 4:] = 0
    want = float(ref_util.calc_prompt_emb_delta_loss(
        torch.from_numpy(embs), torch.from_numpy(mask)))
    got = float(calc_prompt_emb_delta_loss(
        jnp.asarray(embs), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_recon_loss_matches(ref_util):
    rs = np.random.RandomState(3)
    pred = rs.randn(2, 4, 8, 8).astype(np.float32)
    gt = rs.randn(2, 4, 8, 8).astype(np.float32)
    img_mask = (rs.rand(2, 1, 8, 8) > 0.2).astype(np.float32)
    fg_mask = (rs.rand(2, 1, 8, 8) > 0.5).astype(np.float32)
    want, _ = ref_util.calc_recon_loss(
        torch.nn.functional.mse_loss, torch.from_numpy(pred),
        torch.from_numpy(gt), torch.from_numpy(img_mask),
        torch.from_numpy(fg_mask), fg_pixel_weight=2.0,
        bg_pixel_weight=0.5)
    got = float(calc_recon_loss(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(img_mask),
        jnp.asarray(fg_mask), fg_pixel_weight=2.0, bg_pixel_weight=0.5))
    np.testing.assert_allclose(got, float(want), atol=1e-5)


def test_elastic_matching_matches_reference(ref_util):
    """Full elastic-matching parity (`calc_elastic_matching_loss`,
    `ldm/util.py:2549-2758` + `calc_sc_recon_ssfg_mc_losses:2314-2548`),
    flow_model=None (the reference default): crop+resize conventions,
    fg/bg demeaning, margin-weighted per-token min, loss-scale capping,
    and the sparse-attn distillation."""
    from adaface_tpu.train.comp_losses import calc_elastic_matching_loss

    rs = np.random.RandomState(5)
    hw, c = 8, 12
    n = hw * hw
    # small magnitudes so no loss crosses the discard threshold (where the
    # reference excludes and we zero — semantics diverge only there)
    q = rs.randn(4, c, n).astype(np.float32)
    attn_out = (rs.randn(4, c, n) * 0.1).astype(np.float32)
    outfeat = (rs.randn(4, c, n) * 0.1).astype(np.float32)
    ssb = np.asarray([[1, 2, 6, 7]], np.int64)  # x0,y0,x1,y1
    scb = np.asarray([[2, 1, 7, 6]], np.int64)

    want_losses, want_sparse, _, want_discard = \
        ref_util.calc_elastic_matching_loss(
            24, None, torch.from_numpy(q), torch.from_numpy(attn_out),
            torch.from_numpy(outfeat), hw, hw, ssb, scb)

    got = calc_elastic_matching_loss(
        jnp.asarray(q), jnp.asarray(attn_out), jnp.asarray(outfeat),
        hw, hw, jnp.asarray(ssb), jnp.asarray(scb))

    for name in ("ssfg", "mc"):
        ref_attn, ref_flow, ref_sameloc, ref_min = [
            float(v) for v in want_losses[name]]
        np.testing.assert_allclose(
            float(got[f"sc_recon_{name}_attn_agg"]), ref_attn, rtol=1e-4,
            err_msg=f"{name} attn_agg")
        np.testing.assert_allclose(
            float(got[f"sc_recon_{name}_sameloc"]), ref_sameloc, rtol=1e-4,
            err_msg=f"{name} sameloc")
        np.testing.assert_allclose(
            float(got[f"sc_recon_{name}_min"]), ref_min, rtol=1e-4,
            err_msg=f"{name} min")
        np.testing.assert_allclose(
            float(got[f"sc_to_{name}_sparse_attns_distill"]),
            float(want_sparse[name]), rtol=1e-3,
            err_msg=f"{name} sparse distill")
    assert float(got["discarded_loss_ratio"]) == float(want_discard) == 0.0


def test_mb_suppress_loss_matches(ref_util):
    """calc_subj_masked_bg_suppress_loss (`ldm/util.py:1822-1918`): subject
    attention summed over K_subj embeddings, bg excess over tolerance,
    mean over positive-excess positions."""
    from adaface_tpu.train.losses import calc_subj_masked_bg_suppress_loss

    rs = np.random.RandomState(7)
    b, heads, s = 1, 2, 12
    hw = 8
    nq = hw * hw
    attn = rs.rand(b, heads, nq, s).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    attn_t = torch.from_numpy(attn)
    # K_subj=3 subject embeddings at token positions 5,6,7
    subj_idx = (torch.zeros(3, dtype=torch.long),
                torch.tensor([5, 6, 7]))
    fg = np.zeros((b, 1, hw, hw), np.float32)
    fg[:, :, 2:6, 2:6] = 1.0
    want = float(ref_util.calc_subj_masked_bg_suppress_loss(
        {23: attn_t, 24: attn_t * 0.5}, subj_idx, b,
        torch.from_numpy(fg)))

    subj_mask = np.zeros((b, s), np.float32)
    subj_mask[:, 5:8] = 1.0
    got = float(calc_subj_masked_bg_suppress_loss(
        {23: jnp.asarray(attn), 24: jnp.asarray(attn * 0.5)},
        jnp.asarray(subj_mask), jnp.asarray(fg)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # full-res mask (32x32 vs the 8x8 attention grid) with an offset
    # small fg: exercises the nearest|bilinear max-resize + binarize of
    # `resize_mask_to_target_size` (`ldm/util.py:1333-1356`)
    fg_hi = np.zeros((b, 1, 32, 32), np.float32)
    fg_hi[:, :, 5:12, 9:19] = 1.0
    want2 = float(ref_util.calc_subj_masked_bg_suppress_loss(
        {23: attn_t, 24: attn_t * 0.5}, subj_idx, b,
        torch.from_numpy(fg_hi)))
    got2 = float(calc_subj_masked_bg_suppress_loss(
        {23: jnp.asarray(attn), 24: jnp.asarray(attn * 0.5)},
        jnp.asarray(subj_mask), jnp.asarray(fg_hi)))
    np.testing.assert_allclose(got2, want2, rtol=1e-5)


def test_var_of_laplacian_matches(ref_util):
    from adaface_tpu.train.recon_multistep import var_of_laplacian

    rs = np.random.RandomState(8)
    imgs = rs.rand(3, 3, 16, 16).astype(np.float32)
    want = ref_util.var_of_laplacian(torch.from_numpy(imgs)).numpy()
    got = np.asarray(var_of_laplacian(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def _attn_kv_capture(rs, b4=4, heads=2, nq=16, s=12, c=10):
    attn = rs.rand(b4, heads, nq, s).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    k = rs.randn(b4, c, s).astype(np.float32)
    v = rs.randn(b4, c, s).astype(np.float32)
    return attn, k, v


def test_rep_attn_distill_matches(ref_util):
    """calc_sc_rep_attn_distill_loss (`ldm/util.py:2047-2122`): sc→sc_rep
    attention MSE (×S×10), subject-K/V to subj-single, non-subject-K/V to
    cls-comp via masked_l2_loss over non-subj+pad positions."""
    from adaface_tpu.train.comp_losses import calc_sc_rep_attn_distill_loss

    rs = np.random.RandomState(9)
    s = 12
    attn, k, v = _attn_kv_capture(rs, s=s)
    cap_t = {"attn": {23: torch.from_numpy(attn)},
             "k": {23: torch.from_numpy(k)},
             "v": {23: torch.from_numpy(v)}}
    subj_idx = (torch.zeros(3, dtype=torch.long), torch.tensor([4, 5, 6]))
    emb = np.zeros((4, s, 1), np.float32)
    emb[:, :9] = 1.0  # 9 real tokens
    pad = 1.0 - emb
    want = ref_util.calc_sc_rep_attn_distill_loss(
        cap_t, subj_idx, torch.from_numpy(emb), torch.from_numpy(pad),
        sc_fg_mask_percent=0.5)
    want = [float(x) for x in want]  # attn, subj_k, nonsubj_k, subj_v, nonsubj_v

    subj_mask = np.zeros((1, s), np.float32)
    subj_mask[:, 4:7] = 1.0
    got = calc_sc_rep_attn_distill_loss(
        {"attn": {23: jnp.asarray(attn)}, "k": {23: jnp.asarray(k)},
         "v": {23: jnp.asarray(v)}},
        jnp.asarray(subj_mask), jnp.asarray(emb), jnp.asarray(pad),
        sc_fg_mask_percent=0.5)
    order = ("subj_attn", "subj_k", "nonsubj_k", "subj_v", "nonsubj_v")
    for name, ref_v in zip(order, want):
        np.testing.assert_allclose(float(got[name]), ref_v, rtol=1e-4,
                                   err_msg=name)
    # gate: below FG_THRES everything is 0 on both sides
    want0 = ref_util.calc_sc_rep_attn_distill_loss(
        cap_t, subj_idx, torch.from_numpy(emb), torch.from_numpy(pad),
        sc_fg_mask_percent=0.05)
    got0 = calc_sc_rep_attn_distill_loss(
        {"attn": {23: jnp.asarray(attn)}, "k": {23: jnp.asarray(k)},
         "v": {23: jnp.asarray(v)}},
        jnp.asarray(subj_mask), jnp.asarray(emb), jnp.asarray(pad),
        sc_fg_mask_percent=0.05)
    assert all(float(x) == 0.0 for x in want0)
    assert all(float(x) == 0.0 for x in got0.values())


def test_cross_t_diff_matches(ref_util):
    """calc_subj_attn_cross_t_diff_loss (`ldm/util.py:2123-2146`)."""
    from adaface_tpu.train.comp_losses import calc_subj_attn_cross_t_diff_loss

    rs = np.random.RandomState(10)
    s = 12
    attn1, _, _ = _attn_kv_capture(rs, s=s)
    attn2, _, _ = _attn_kv_capture(rs, s=s)
    subj_idx = (torch.zeros(3, dtype=torch.long), torch.tensor([4, 5, 6]))
    want = float(ref_util.calc_subj_attn_cross_t_diff_loss(
        {"attn": {23: torch.from_numpy(attn1), 24: torch.from_numpy(attn1 * 0.9)}},
        {"attn": {23: torch.from_numpy(attn2), 24: torch.from_numpy(attn2 * 0.9)}},
        subj_idx))
    subj_mask = np.zeros((1, s), np.float32)
    subj_mask[:, 4:7] = 1.0
    got = float(calc_subj_attn_cross_t_diff_loss(
        {"attn": {23: jnp.asarray(attn1), 24: jnp.asarray(attn1 * 0.9)}},
        {"attn": {23: jnp.asarray(attn2), 24: jnp.asarray(attn2 * 0.9)}},
        jnp.asarray(subj_mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distribute_embedding_matches_reference(ref_util):
    """distribute_embedding_to_M_tokens (`ldm/util.py:550-597`): compel
    embedding CFG + boost + sqrt(M) division at the marked positions."""
    from adaface_tpu.text.embedding_manager import (
        distribute_embedding_to_M_tokens)

    rs = np.random.RandomState(11)
    embs = rs.randn(1, 10, 8).astype(np.float32)
    uncond = rs.randn(1, 10, 8).astype(np.float32)
    idx = torch.tensor([3, 4, 5, 6])
    want = ref_util.distribute_embedding_to_M_tokens(
        torch.from_numpy(embs), torch.from_numpy(uncond), idx).numpy()
    smap = np.full((1, 10), -1, np.int32)
    smap[0, 3:7] = np.arange(4)
    got = np.asarray(distribute_embedding_to_M_tokens(
        jnp.asarray(embs), jnp.asarray(smap), jnp.asarray(uncond)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_merge_cls_token_embeddings_matches_reference(ref_util):
    """merge_cls_token_embeddings (`ldm/util.py:683-737`): each M-token
    class span collapses to its summed embedding, tail shifts left, the
    last off positions stay untouched — including the multi-span
    sequential-write semantics."""
    from adaface_tpu.text.embedding_manager import (
        apply_merge_map,
        build_merge_map,
    )

    rs = np.random.RandomState(12)
    s = 14
    cases = [
        [(0, 3, 3, "a")],                          # single span
        [(0, 3, 1, "a")],                          # M=1 (no shift)
        [(0, 2, 2, "a"), (0, 7, 3, "b")],          # two spans, one row
        [(0, 3, 2, "a"), (1, 5, 4, "b")],          # spans in two rows
    ]
    for spans in cases:
        embs = rs.randn(2, s, 6).astype(np.float32)
        want = ref_util.merge_cls_token_embeddings(
            torch.from_numpy(embs), spans).numpy()
        mm = build_merge_map(2, s, spans)
        got = np.asarray(apply_merge_map(jnp.asarray(embs),
                                         jnp.asarray(mm)))
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"spans={spans}")


def test_anneal_value_matches_reference(ref_util):
    from adaface_tpu.utils.tensor import anneal_value

    for tp in (0.0, 0.1, 0.25, 0.49, 0.5, 0.7, 1.0):
        for fp in (0.3, 0.5, 1.0):
            want = ref_util.anneal_value(tp, fp, (1.0, 3.0))
            got = anneal_value(tp, fp, (1.0, 3.0))
            assert got == pytest.approx(want), (tp, fp)
    # array annealing (anneal_array, `ldm/util.py:1253-1258`)
    want = ref_util.anneal_array(0.2, 0.5, [1.0, 2.0], [3.0, 0.0])
    got = anneal_value(0.2, 0.5, (np.array([1.0, 2.0]), np.array([3.0, 0.0])))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_init_x_with_fg_matches_reference(ref_util, monkeypatch):
    """init_x_with_fg_from_training_image (`ldm/util.py:1599-1672`):
    bilinear fg shrink + zero-pad + bg noise fill + global noise blend.
    torch randomness is patched to deterministic draws mirrored on our
    side, so the comparison is exact."""
    from adaface_tpu.train.init_x import init_x_with_fg_from_training_image

    rs = np.random.RandomState(13)
    b, c, h, w = 2, 4, 16, 16
    x = rs.randn(b, c, h, w).astype(np.float32)
    fg = np.zeros((b, 1, h, w), np.float32)
    fg[:, :, 4:13, 3:12] = 1.0
    n1 = rs.randn(b, c, h, w).astype(np.float32)
    n2 = rs.randn(b, c, h, w).astype(np.float32)
    n3 = rs.randn(b, c, h, w).astype(np.float32)

    scale = 0.75
    noises = iter([n1, n2, n3])
    monkeypatch.setattr(torch, "rand",
                        lambda *a, **k: torch.full(a if a else (1,), scale))
    monkeypatch.setattr(torch, "randn_like",
                        lambda t: torch.from_numpy(next(noises)))
    monkeypatch.setattr(torch, "randint",
                        lambda lo, hi, size: torch.zeros(size,
                                                         dtype=torch.long))
    # reference draws rand for fg_rand_scale; with fg ~31% > 0.2 the
    # scale becomes rand()*(ub2-lb2)+lb2 — make both sides use the SAME
    # effective scale by computing it the reference way here
    import math as _m

    fgp = fg.sum() / fg.size
    extra = _m.pow(0.2 / fgp, 0.35)
    lb2, ub2 = 0.8 * extra, max(0.5, 1.0 * extra)
    eff_scale = scale * (ub2 - lb2) + lb2

    want_x, want_m = ref_util.init_x_with_fg_from_training_image(
        torch.from_numpy(x), torch.from_numpy(fg))
    got_x, got_m = init_x_with_fg_from_training_image(
        jnp.asarray(x), jnp.asarray(fg), scale=eff_scale, dh=0, dw=0,
        bg_noise1=jnp.asarray(n1), bg_noise2=jnp.asarray(n2),
        blend_noise=jnp.asarray(n3))
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(), atol=1e-5)
