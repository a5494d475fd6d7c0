import numpy as np
import pytest

from adaface_tpu.tools.ckpt_lib import (
    average_state_dicts,
    cast_fp16,
    check_weights,
    extract_subtree,
    load_state_dict,
    model_diff,
    replace_by_pattern,
    replace_subtree,
    save_state_dict,
)


def _sd(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "first_stage_model.encoder.w": rs.randn(4, 4).astype(np.float32),
        "cond_stage_model.emb": rs.randn(3).astype(np.float32),
        "model.diffusion_model.conv.w": rs.randn(2, 2).astype(np.float32),
        "step": np.asarray(5),
    }


def test_save_load_roundtrip_formats(tmp_path):
    sd = _sd()
    for ext in ("safetensors", "npz"):
        p = str(tmp_path / f"ckpt.{ext}")
        save_state_dict({k: v for k, v in sd.items() if k != "step"}, p)
        back = load_state_dict(p)
        np.testing.assert_allclose(back["cond_stage_model.emb"],
                                   sd["cond_stage_model.emb"])


def test_replace_subtree():
    base, donor = _sd(0), _sd(1)
    out = replace_subtree(base, donor, "first_stage_model.")
    np.testing.assert_allclose(out["first_stage_model.encoder.w"],
                               donor["first_stage_model.encoder.w"])
    np.testing.assert_allclose(out["cond_stage_model.emb"],
                               base["cond_stage_model.emb"])
    with pytest.raises(KeyError):
        replace_subtree(base, donor, "nonexistent.")


def test_extract_average_fp16_diff():
    a, b = _sd(0), _sd(1)
    unet = extract_subtree(a, "model.diffusion_model.")
    assert list(unet) == ["conv.w"]

    avg = average_state_dicts([a, b], [0.5, 0.5])
    np.testing.assert_allclose(
        avg["cond_stage_model.emb"],
        (a["cond_stage_model.emb"] + b["cond_stage_model.emb"]) / 2, rtol=1e-6)

    h = cast_fp16(a)
    assert h["first_stage_model.encoder.w"].dtype == np.float16
    assert h["step"].dtype != np.float16

    rows, ma, mb = model_diff(a, b)
    assert rows[0][1] > 0 and not ma and not mb


def test_check_and_pattern_replace():
    a = _sd(0)
    a["bad"] = np.asarray([np.nan, 1.0], np.float32)
    stats = check_weights(a)
    assert stats["nan_keys"] == ["bad"]

    donor = _sd(1)
    out = replace_by_pattern(_sd(0), donor, ["*diffusion_model*"])
    np.testing.assert_allclose(out["model.diffusion_model.conv.w"],
                               donor["model.diffusion_model.conv.w"])


def test_torch_ckpt_loading(tmp_path):
    import torch

    p = str(tmp_path / "m.ckpt")
    torch.save({"state_dict": {"a.w": torch.arange(4.0)}}, p)
    sd = load_state_dict(p)
    np.testing.assert_allclose(sd["a.w"], [0, 1, 2, 3])


def test_load_sd_towers_diffusers_unet(tmp_path):
    """`load_sd_towers` on a bare diffusers UNet state dict (train.py
    --base_model / scripts --base_model path)."""
    import jax

    from adaface_tpu.models.unet import UNetConfig, init_unet_params
    from adaface_tpu.tools.ckpt_lib import save_state_dict
    from adaface_tpu.tools.convert_sd import export_unet_to_diffusers, load_sd_towers

    cfg = UNetConfig(block_channels=(32, 64, 64, 64), cross_attn_dim=48,
                     num_heads=4, norm_groups=8)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    sd = export_unet_to_diffusers(params, cfg)
    path = str(tmp_path / "unet.npz")
    save_state_dict({k: np.asarray(v) for k, v in sd.items()}, path)
    import adaface_tpu.tools.convert_sd as m
    orig = m.SD15_UNET
    try:
        m.SD15_UNET = cfg  # default arg resolution happens at call time inside convert_unet
        towers = load_sd_towers(path)
    finally:
        m.SD15_UNET = orig
    assert set(towers) == {"unet"}


def test_flatten_unflatten_roundtrip():
    from adaface_tpu.tools.ckpt_lib import flatten_tree, unflatten_tree

    tree = {"a": {"b": np.ones((2,)), "c": np.zeros((3,))},
            "d": np.full((1,), 7.0)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a.b", "a.c", "d"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["d"], tree["d"])


def test_clean_log_folders(tmp_path):
    from adaface_tpu.tools.ckpt_lib import clean_log_folders

    for run, steps in [("runA", [500, 1000, 1500]), ("runB", [500]),
                       ("skipme", [500, 1000])]:
        ck = tmp_path / run / "checkpoints"
        ck.mkdir(parents=True)
        for s in steps:
            d = ck / f"embeddings_gs-{s}"
            d.mkdir()
            (d / "manifest.json").write_text("{}")
        (tmp_path / run / "samples").mkdir()
        (tmp_path / run / "samples" / "x.png").write_text("")

    # mock run deletes nothing
    n = clean_log_folders(str(tmp_path), pat="run", mock=True)
    assert n == 2
    assert (tmp_path / "runA/checkpoints/embeddings_gs-500").exists()

    n = clean_log_folders(str(tmp_path), pat="run", skip_pat="skipme",
                          del_samples=True)
    assert n == 2
    assert not (tmp_path / "runA/checkpoints/embeddings_gs-500").exists()
    assert not (tmp_path / "runA/checkpoints/embeddings_gs-1000").exists()
    assert (tmp_path / "runA/checkpoints/embeddings_gs-1500").exists()
    assert (tmp_path / "runB/checkpoints/embeddings_gs-500").exists()
    assert not (tmp_path / "runA/samples").exists()
    # skipped run untouched
    assert (tmp_path / "skipme/checkpoints/embeddings_gs-500").exists()
    assert (tmp_path / "skipme/samples").exists()

    # keep=2 retains the two largest
    n = clean_log_folders(str(tmp_path), pat="skipme", keep=2)
    assert n == 0
