"""fp/p-trick prompt-variant selection + suffixes (`ddpm.py:956-1084`).

Asserts the planner's per-iteration-type prompt-key distribution matches
the reference's probabilities, and that the dataset emits every variant
the selector can choose.
"""

import collections

import numpy as np

from adaface_tpu.train.iteration_plan import IterationPlanner


def _dist(planner, n=4000):
    per_type = collections.defaultdict(collections.Counter)
    suffixes = collections.defaultdict(collections.Counter)
    noise_frac = collections.Counter()
    for i in range(n):
        f = planner.plan(i)
        per_type[f.iter_type][f.prompt_keys[0]] += 1
        suffixes[f.iter_type][f.prompt_suffix] += 1
        if f.iter_type == "recon":
            noise_frac[f.normal_recon_on_pure_noise] += 1
    return per_type, suffixes, noise_frac


def test_prompt_key_distribution_per_iter_type():
    p = IterationPlanner(comp_distill_iter_gap=4, unet_distill_iter_gap=5,
                         use_fp_trick=True)
    per_type, suffixes, noise = _dist(p)

    # --- comp-distill: p_use_fp_trick = 0.5 (`ddpm.py:976`) ---
    comp = per_type["comp_distill"]
    total = sum(comp.values())
    # fp-trick → subj_single_mod_prompt_fp (`:1015`); otherwise the subj
    # single still uses mod_fp (`:1035`) — so ss key is ALWAYS mod_fp
    assert set(comp) == {"subj_single_mod_prompt_fp"}
    # suffixes: 'clear face' only without the fp trick (p 0.5*0.8 = 0.4),
    # 'front view' at 0.8
    sfx = suffixes["comp_distill"]
    front = sum(v for k, v in sfx.items() if "front view" in k) / total
    clear = sum(v for k, v in sfx.items() if "clear face" in k) / total
    assert 0.7 < front < 0.9, front
    assert 0.3 < clear < 0.5, clear

    # --- recon (comp enabled): pure-noise p=0.4; on-image p_fp = 1 ---
    rn = noise[True] / (noise[True] + noise[False])
    assert 0.33 < rn < 0.47, rn
    recon = per_type["recon"]
    # on-image → always fp single prompts (`:981-982,1023`); pure-noise →
    # mod fp/p 50/50 (`:999-1009`)
    assert recon["subj_single_prompt_fp"] > 0
    assert recon["subj_single_mod_prompt_fp"] > 0
    assert recon["subj_single_mod_prompt_p"] > 0
    assert "subj_single_prompt" not in recon
    mod_fp = recon["subj_single_mod_prompt_fp"]
    mod_p = recon["subj_single_mod_prompt_p"]
    assert 0.7 < mod_fp / mod_p < 1.4
    # no suffixes outside comp iterations (`:1064-1069`)
    assert set(suffixes["recon"]) == {""}

    # --- unet-distill: p_fp = 0 → base prompts ---
    dist = per_type["unet_distill"]
    assert set(dist) <= {"subj_single_prompt", "subj_single_mod_prompt_fp",
                         "subj_single_mod_prompt_p"}
    assert dist["subj_single_prompt"] > 0
    assert set(suffixes["unet_distill"]) == {""}


def test_fp_trick_disabled_without_comp():
    """Stage-1-only (no comp distill): use_fp_trick is effectively off for
    recon-on-image (`ddpm.py:983-987`)."""
    p = IterationPlanner(comp_distill_iter_gap=0, unet_distill_iter_gap=2,
                         use_fp_trick=True,
                         p_normal_recon_on_pure_noise=0.0)
    per_type, _, _ = _dist(p, n=500)
    assert set(per_type["recon"]) == {"subj_single_prompt"}


def test_cls_p_trick_alternation_on_comp():
    """cls comp prompts use the p trick 3 of every 4 comp iterations when
    the fp draw misses (`ddpm.py:1041-1046`)."""
    p = IterationPlanner(comp_distill_iter_gap=1, use_fp_trick=True)
    keys = [p.plan(i).prompt_keys for i in range(400)]
    cls_keys = collections.Counter(k[3] for k in keys)
    assert cls_keys["cls_comp_mod_prompt_fp"] > 0  # fp-trick draws
    assert cls_keys["cls_comp_mod_prompt_p"] > 0
    assert cls_keys["cls_comp_mod_prompt"] > 0
    # non-fp draws split ~3:1 between p-trick and plain
    ratio = cls_keys["cls_comp_mod_prompt_p"] / cls_keys["cls_comp_mod_prompt"]
    assert 2.0 < ratio < 4.5, ratio


def test_recon_lora_and_adv_draws():
    p = IterationPlanner(comp_distill_iter_gap=0, unet_distill_iter_gap=0,
                         p_normal_recon_on_pure_noise=0.4,
                         p_do_adv_attack_when_recon_on_images=0.5)
    flags = [p.plan(i) for i in range(2000)]
    on_img = [f for f in flags if not f.normal_recon_on_pure_noise]
    on_noise = [f for f in flags if f.normal_recon_on_pure_noise]
    # attn-LoRA gate ~50% on image, never on pure noise (`ddpm.py:2307-2317`)
    gate = np.mean([f.recon_enable_attn_lora for f in on_img])
    assert 0.4 < gate < 0.6, gate
    assert not any(f.recon_enable_attn_lora for f in on_noise)
    assert not any(f.do_adv_attack for f in on_noise)
    adv = np.mean([f.do_adv_attack for f in on_img])
    assert 0.4 < adv < 0.6, adv
    # ffn adapter flips to comp_distill ~25% on image (`ddpm.py:2319-2325`)
    comp_adapter = np.mean([f.recon_ffn_adapter == "comp_distill"
                            for f in on_img])
    assert 0.15 < comp_adapter < 0.35, comp_adapter


def test_dataset_emits_all_selectable_variants(tmp_path):
    import json

    from PIL import Image

    from adaface_tpu.data.personalized import PersonalizedBase

    d = tmp_path / "subj"
    d.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(d / "0.png")
    (tmp_path / "metainfo.json").write_text(json.dumps(
        {"subj": {"cls_delta_string": "person"}}))
    ds = PersonalizedBase(str(tmp_path), num_vectors_per_subj_token=4,
                          size=64, seed=0)
    ex = ds[0]
    p = IterationPlanner(comp_distill_iter_gap=2, unet_distill_iter_gap=2)
    seen = set()
    for i in range(200):
        seen.update(p.plan(i).prompt_keys)
    missing = [k for k in seen if k not in ex]
    assert not missing, missing
