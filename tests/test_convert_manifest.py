"""Full-size real-checkpoint key-manifest conversion tests (VERDICT r4 #7).

Real weight files remain unavailable in this environment, so the next
best no-op-first-contact guarantee: build the EXACT key manifest
(names + shapes) of the published checkpoints from the authoritative
torch classes — the reference's own LDM `UNetModel` / VAE modules (what
`v1-5-pruned.ckpt` pickles, loaded at `ldm/util.py:130`) and HF
`CLIPTextModel` at the real CLIP-L / OpenCLIP-bigG configs — on the
torch `meta` device (shapes without memory), materialize zeros at those
exact names+shapes, and drive our converters through them at FULL size.
Output pytrees must match `jax.eval_shape` of our own initializers
leaf-for-leaf.

SDXL's SGM-layout UNet has no authoritative torch class in this image
(diffusers absent, the reference is LDM-based); its diffusers-layout
round trip is covered by `test_convert_fullfile.py` +
`test_golden_sdxl.py`, and `ldm_unet_to_diffusers_keys` is exercised on
the reference class's real key set here via the SD1.5 manifest.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tests.test_convert_fullfile import _stub_modules  # noqa: E402


def _meta_state_shapes(module) -> dict:
    return {k: tuple(v.shape) for k, v in module.state_dict().items()}


def _zeros(manifest: dict) -> dict:
    return {k: np.zeros(s, np.float16) for k, s in manifest.items()}


def _assert_same_tree(converted, expected, where="", allowed_extra=()):
    """Leaf-for-leaf shape equality between a converted param tree and
    jax.eval_shape of our initializer. `allowed_extra`: leaf-path
    substrings the converter may add beyond the initializer's tree
    (e.g. a checkpoint's pos_embed buffer that init computes on the
    fly)."""
    # str(shape) so the shape tuple stays ONE leaf (tuples are pytree
    # nodes and would explode into ints)
    got = jax.tree_util.tree_map(lambda x: str(tuple(x.shape)), converted)
    want = jax.tree_util.tree_map(lambda x: str(tuple(x.shape)), expected)
    gl = jax.tree_util.tree_flatten_with_path(got)[0]
    wl = jax.tree_util.tree_flatten_with_path(want)[0]
    gd = {jax.tree_util.keystr(p): s for p, s in gl}
    wd = {jax.tree_util.keystr(p): s for p, s in wl}
    missing = sorted(set(wd) - set(gd))
    extra = sorted(k for k in set(gd) - set(wd)
                   if not any(a in k for a in allowed_extra))
    assert not missing, f"{where}: converter missing leaves {missing[:8]}"
    assert not extra, f"{where}: converter extra leaves {extra[:8]}"
    bad = [(k, gd[k], wd[k]) for k in wd if gd[k] != wd[k]]
    assert not bad, f"{where}: shape mismatches {bad[:8]}"


@pytest.fixture(scope="module")
def ldm_modules():
    _stub_modules()
    try:
        from ldm.modules.diffusionmodules import model as vae_mod
        from ldm.modules.diffusionmodules.openaimodel import UNetModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return UNetModel, vae_mod


def test_sd15_unet_full_manifest(ldm_modules):
    """Real v1-5 UNet manifest (865M params' names+shapes from the
    reference's own class) → LDM→diffusers key map → convert_unet →
    exact shape match with init_unet_params(SD15_UNET)."""
    from adaface_tpu.models.unet import SD15_UNET, init_unet_params
    from adaface_tpu.tools.convert_ldm_unet import convert_ldm_unet

    UNetModel, _ = ldm_modules
    with torch.device("meta"):
        unet = UNetModel(
            in_channels=4, model_channels=320,
            out_channels=4, num_res_blocks=2,
            attention_resolutions=[4, 2, 1], dropout=0.0,
            channel_mult=(1, 2, 4, 4), num_heads=8,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=768, use_checkpoint=False, legacy=False)
    manifest = {f"model.diffusion_model.{k}": s
                for k, s in _meta_state_shapes(unet).items()}
    assert len(manifest) > 600  # the real file has ~686 UNet tensors
    sd = _zeros(manifest)
    params = convert_ldm_unet(sd, SD15_UNET)
    expected = jax.eval_shape(
        lambda k: init_unet_params(k, SD15_UNET), jax.random.PRNGKey(0))
    _assert_same_tree(params, expected, "sd15-unet")


def test_sd15_vae_full_manifest(ldm_modules):
    """Real SD VAE manifest (first_stage_model.*, 128-ch ch_mult 1244)
    → convert_vae_ldm → exact shape match with init_vae_params(SD_VAE)."""
    from adaface_tpu.models.vae import SD_VAE, init_vae_params
    from adaface_tpu.tools.convert_sd import convert_vae_ldm

    _, vae_mod = ldm_modules
    kw = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
              attn_resolutions=[], dropout=0.0, in_channels=3,
              resolution=256, z_channels=4)
    with torch.device("meta"):
        enc = vae_mod.Encoder(double_z=True, **kw)
        dec = vae_mod.Decoder(**kw)
        quant = torch.nn.Conv2d(8, 8, 1)
        post_quant = torch.nn.Conv2d(4, 4, 1)
    manifest = {}
    for mod, pfx in ((enc, "encoder."), (dec, "decoder."),
                     (quant, "quant_conv."), (post_quant, "post_quant_conv.")):
        for k, s in _meta_state_shapes(mod).items():
            manifest[f"first_stage_model.{pfx}{k}"] = s
    sd = _zeros(manifest)
    params = convert_vae_ldm(sd, SD_VAE)
    expected = jax.eval_shape(
        lambda k: init_vae_params(k, SD_VAE), jax.random.PRNGKey(0))
    _assert_same_tree(params, expected, "sd15-vae")


def test_clip_l_full_manifest():
    """Real CLIP-L text-tower manifest (cond_stage_model.transformer.*,
    the exact HF CLIPTextModel keys) → convert_text_model → shape match
    with init_text_params(CLIP_L_TEXT) + recovered config equality."""
    try:
        from transformers import CLIPTextConfig as HFCfg, CLIPTextModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"transformers import failed: {e}")
    from adaface_tpu.models.clip import CLIP_L_TEXT, init_text_params
    from adaface_tpu.tools.convert_clip import convert_text_model

    with torch.device("meta"):
        text = CLIPTextModel(HFCfg(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77))
    manifest = _meta_state_shapes(text)
    sd = _zeros(manifest)
    params, cfg = convert_text_model(sd)
    assert cfg.hidden_size == CLIP_L_TEXT.hidden_size
    assert cfg.num_layers == CLIP_L_TEXT.num_layers
    assert cfg.num_heads == CLIP_L_TEXT.num_heads
    assert cfg.intermediate_size == CLIP_L_TEXT.intermediate_size
    assert cfg.vocab_size == CLIP_L_TEXT.vocab_size
    expected = jax.eval_shape(
        lambda k: init_text_params(k, CLIP_L_TEXT), jax.random.PRNGKey(0))
    _assert_same_tree(params, expected, "clip-l")


def test_clip_bigg_full_manifest():
    """OpenCLIP bigG text tower (SDXL encoder 2 /
    CLIPTextModelWithProjection layout: 1280-d, 32 layers, 20 heads,
    gelu, text_projection) → convert_text_model(hidden_act='gelu')."""
    try:
        from transformers import (CLIPTextConfig as HFCfg,
                                  CLIPTextModelWithProjection)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"transformers import failed: {e}")
    from adaface_tpu.models.clip import init_text_params
    from adaface_tpu.tools.convert_clip import convert_text_model

    with torch.device("meta"):
        text = CLIPTextModelWithProjection(HFCfg(
            vocab_size=49408, hidden_size=1280, intermediate_size=5120,
            num_hidden_layers=32, num_attention_heads=20,
            max_position_embeddings=77, hidden_act="gelu",
            projection_dim=1280))
    manifest = _meta_state_shapes(text)
    sd = _zeros(manifest)
    params, cfg = convert_text_model(sd, hidden_act="gelu")
    assert cfg.hidden_size == 1280 and cfg.num_layers == 32
    assert cfg.num_heads == 20 and cfg.projection_dim == 1280
    assert cfg.hidden_act == "gelu"
    expected = jax.eval_shape(
        lambda k: init_text_params(k, cfg), jax.random.PRNGKey(0))
    _assert_same_tree(params, expected, "clip-bigg")


def test_sd3_mmdit_full_manifest():
    """SD3-medium MMDiT manifest at the full published dims (38.6M-param
    tensors per the diffusers SD3Transformer2DModel layout mirrored by
    `test_golden_mmdit`'s oracle): 24 blocks, 1536 hidden, patch 2,
    pos_embed 192². Uses the torch oracle on the meta device."""
    from adaface_tpu.models.mmdit import MMDiTConfig, init_mmdit_params
    from adaface_tpu.tools.convert_mmdit import convert_mmdit

    try:
        from tests.test_golden_mmdit import TorchMMDiT
    except Exception as e:  # pragma: no cover
        pytest.skip(f"mmdit oracle import failed: {e}")

    cfg = MMDiTConfig()  # full SD3-medium defaults
    with torch.device("meta"):
        oracle = TorchMMDiT(cfg)
    manifest = _meta_state_shapes(oracle)
    sd = _zeros(manifest)
    params = convert_mmdit(sd, cfg)
    # the real file's learned pos_embed buffer rides along as
    # pos_embed_table (init computes sin/cos on the fly) — check it
    # explicitly, exclude from the tree diff
    assert tuple(params["pos_embed_table"].shape) == (
        cfg.pos_embed_max_size ** 2, cfg.hidden)
    expected = jax.eval_shape(
        lambda k: init_mmdit_params(k, cfg), jax.random.PRNGKey(0))
    _assert_same_tree(params, expected, "sd3-mmdit",
                      allowed_extra=("pos_embed_table",))
