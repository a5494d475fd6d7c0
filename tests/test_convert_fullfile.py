"""Full-layout single-file SD checkpoint conversion hardening.

Assembles a synthetic checkpoint with the REAL v1-5-pruned.ckpt layout —
`model.diffusion_model.*` + `first_stage_model.*` +
`cond_stage_model.transformer.*` key prefixes, flattened LitEma
`model_ema.*` shadow weights, schedule buffers (betas/alphas_cumprod/...),
EMA bookkeeping scalars, fp16 tensors — from small torch oracle towers,
and drives `load_sd_towers` (tools/convert_sd.py) through it end to end,
so the first contact with a real weight file isn't in production
(VERDICT r2 #9). Reference loader being mirrored:
`ldm/util.py:130` (`load_model_from_config`) + `scripts/ckpt_lib.py`.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.models.vae import VAEConfig
from adaface_tpu.tools.convert_sd import load_sd_towers

UNET_CFG = UNetConfig(
    in_channels=4, out_channels=4, block_channels=(32, 64),
    layers_per_block=1, cross_attn_dim=16, num_heads=2, norm_groups=32,
    down_has_attn=(True, False), up_has_attn=(False, True),
    time_embed_dim=128)
VAE_CFG = VAEConfig(base_ch=32, ch_mult=(1, 2), num_res_blocks=1,
                    norm_groups=32)


def _stub_modules():
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.draw_bounding_boxes = lambda *a, **k: None
        tv.utils = tvu
        # transformers probes `torchvision.__spec__` for availability —
        # a spec-less stub makes IT fail ("torchvision.__spec__ is None")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tvu.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.utils", None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        oc.ListConfig = ListConfig
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")


@pytest.fixture(scope="module")
def full_state_dict():
    """Synthetic full-layout state dict from real torch towers."""
    _stub_modules()
    try:
        from ldm.modules.diffusionmodules import model as vae_mod
        from ldm.modules.diffusionmodules.openaimodel import UNetModel
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    try:
        from transformers import CLIPTextConfig as HFCfg, CLIPTextModel
    except Exception as e:
        pytest.skip(f"transformers import failed: {e}")

    torch.manual_seed(0)
    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1], dropout=0.0, channel_mult=(1, 2),
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, use_checkpoint=False, legacy=False).eval()
    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], dropout=0.0, in_channels=3,
              resolution=32, z_channels=4)
    enc = vae_mod.Encoder(double_z=True, **kw).eval()
    dec = vae_mod.Decoder(**kw).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    text = CLIPTextModel(HFCfg(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77)).eval()

    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v.half().numpy()
        # LitEma flattened shadow name: dots removed from the param path
        ema = ("model_ema." + f"diffusion_model.{k}".replace(".", ""))
        sd[ema] = (v * 1.5).half().numpy()
    for k, v in enc.state_dict().items():
        sd[f"first_stage_model.encoder.{k}"] = v.half().numpy()
    for k, v in dec.state_dict().items():
        sd[f"first_stage_model.decoder.{k}"] = v.half().numpy()
    for k, v in quant.state_dict().items():
        sd[f"first_stage_model.quant_conv.{k}"] = v.half().numpy()
    for k, v in post_quant.state_dict().items():
        sd[f"first_stage_model.post_quant_conv.{k}"] = v.half().numpy()
    for k, v in text.state_dict().items():
        sd[f"cond_stage_model.transformer.{k}"] = v.numpy()
    # schedule buffers + EMA bookkeeping, as in real v1-5-pruned.ckpt
    for name in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                 "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                 "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2"):
        sd[name] = np.linspace(1e-4, 2e-2, 1000).astype(np.float32)
    sd["model_ema.decay"] = np.float32(0.9999)
    sd["model_ema.num_updates"] = np.int64(120000)
    return sd


def _write(sd, path):
    from adaface_tpu.tools.ckpt_lib import save_state_dict

    save_state_dict(sd, path)
    return path


def test_full_layout_safetensors_roundtrip(full_state_dict, tmp_path):
    path = _write(full_state_dict, str(tmp_path / "sd15_full.safetensors"))
    out = load_sd_towers(path, unet_cfg=UNET_CFG, vae_cfg=VAE_CFG)
    assert set(out) >= {"unet", "vae", "text_encoder", "text_cfg"}
    # fp16 source upcast to fp32
    import jax

    for leaf in jax.tree_util.tree_leaves(out["unet"]):
        assert leaf.dtype == np.float32, leaf.dtype
    # parity with the direct tower-wise converter on the clean subdict
    from adaface_tpu.tools.convert_ldm_unet import convert_ldm_unet

    clean = {k: v for k, v in full_state_dict.items()
             if k.startswith("model.diffusion_model.")}
    want = convert_ldm_unet(clean, UNET_CFG)
    got_leaves = jax.tree_util.tree_leaves(out["unet"])
    want_leaves = jax.tree_util.tree_leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32), atol=0)
    # text config auto-derived
    assert out["text_cfg"].hidden_size == 32
    assert out["text_cfg"].num_layers == 2


def test_prefer_ema_substitutes_shadow_weights(full_state_dict, tmp_path):
    path = _write(full_state_dict, str(tmp_path / "sd15_full.safetensors"))
    base = load_sd_towers(path, unet_cfg=UNET_CFG, vae_cfg=VAE_CFG)
    ema = load_sd_towers(path, unet_cfg=UNET_CFG, vae_cfg=VAE_CFG,
                         prefer_ema=True)
    import jax

    b0 = jax.tree_util.tree_leaves(base["unet"])
    e0 = jax.tree_util.tree_leaves(ema["unet"])
    # EMA shadows were written as 1.5x the live weights
    ratios = [float(np.abs(e).sum() / (np.abs(b).sum() + 1e-9))
              for b, e in zip(b0, e0) if float(np.abs(b).sum()) > 0]
    np.testing.assert_allclose(ratios, 1.5, rtol=1e-2)
    # VAE/text towers untouched by prefer_ema
    for b, e in zip(jax.tree_util.tree_leaves(base["vae"]),
                    jax.tree_util.tree_leaves(ema["vae"])):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(e))


def test_vae_runs_from_fullfile(full_state_dict, tmp_path):
    import jax
    import jax.numpy as jnp

    from adaface_tpu.models.vae import vae_decode, vae_encode

    path = _write(full_state_dict, str(tmp_path / "sd15_full.safetensors"))
    out = load_sd_towers(path, unet_cfg=UNET_CFG, vae_cfg=VAE_CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    z = vae_encode(out["vae"], x, VAE_CFG)
    y = vae_decode(out["vae"], z, VAE_CFG)
    assert y.shape == (1, 3, 32, 32)
    assert bool(jnp.isfinite(y).all())
