"""Golden parity for the UNet against the reference torch LDM UNetModel.

The reference's live training path wraps the diffusers
`UNet2DConditionModel` (`ldm/models/diffusion/ddpm.py:4084-4252`), which is
weight-compatible with the legacy LDM `UNetModel`
(`ldm/modules/diffusionmodules/openaimodel.py:414`) — single-file SD
checkpoints store LDM-format weights and `convert_ldm_unet` renames them.
diffusers itself is not installed here, so the torch LDM UNet is the
oracle: a tiny two-level config with the SD1.5 block pattern (attention on
the shallow level only, mirroring SD1.5's attention-free deepest block) is
instantiated in torch, its state dict converted by
`ldm_unet_to_diffusers_keys` + `convert_unet`, and both nets must agree on
identical inputs. This exercises resnets, spatial transformers
(self+cross attention, GEGLU FF), down/upsampling, skip concatenation,
time embedding, and the converter chain end to end.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from adaface_tpu.models.unet import UNetConfig, unet_apply
from adaface_tpu.tools.convert_ldm_unet import convert_ldm_unet

CFG = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_channels=(32, 64),
    layers_per_block=1,
    cross_attn_dim=16,
    num_heads=2,
    norm_groups=32,
    down_has_attn=(True, False),
    up_has_attn=(False, True),
    time_embed_dim=128,
)


@pytest.fixture(scope="module")
def ref_unet():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.draw_bounding_boxes = lambda *a, **k: None
        tv.utils = tvu
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
    try:
        from ldm.modules.diffusionmodules.openaimodel import UNetModel
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference import failed: {e}")
    torch.manual_seed(0)
    net = UNetModel(
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=[1],
        dropout=0.0,
        channel_mult=(1, 2),
        num_heads=2,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=16,
        use_checkpoint=False,
        legacy=False,
    ).eval()
    return net


@pytest.fixture(scope="module")
def converted(ref_unet):
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in ref_unet.state_dict().items()}
    return convert_ldm_unet(sd, CFG)


def _run_pair(ref_unet, params, x, t, ctx):
    with torch.no_grad():
        want = ref_unet(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(ctx), extra_info={}).numpy()
    got, _ = unet_apply(params, jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(ctx), cfg=CFG)
    return np.asarray(got), want


def test_unet_matches_reference(ref_unet, converted):
    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([7.0, 341.0], dtype=np.float32)
    ctx = rs.randn(2, 9, 16).astype(np.float32)
    got, want = _run_pair(ref_unet, converted, x, t, ctx)
    assert got.shape == want.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_unet_matches_reference_extreme_t(ref_unet, converted):
    rs = np.random.RandomState(2)
    x = rs.randn(1, 4, 16, 16).astype(np.float32)
    ctx = rs.randn(1, 5, 16).astype(np.float32)
    for tv in (0.0, 999.0):
        t = np.array([tv], dtype=np.float32)
        got, want = _run_pair(ref_unet, converted, x, t, ctx)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_unet_matches_reference_deep(ref_unet):
    """3-level, 2-resblock config — SD1.5's exact block pattern scaled
    down; exercises the converter's multi-resblock input/output_block
    indexing (3i+1… layout, `convert_ldm_unet.py:9-13`)."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    cfg = UNetConfig(
        in_channels=4,
        out_channels=4,
        block_channels=(32, 64, 64),
        layers_per_block=2,
        cross_attn_dim=16,
        num_heads=2,
        norm_groups=32,
        down_has_attn=(True, True, False),
        up_has_attn=(False, True, True),
        time_embed_dim=128,
    )
    torch.manual_seed(3)
    net = UNetModel(
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=2,
        attention_resolutions=[1, 2],
        dropout=0.0,
        channel_mult=(1, 2, 2),
        num_heads=2,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=16,
        use_checkpoint=False,
        legacy=False,
    ).eval()
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in net.state_dict().items()}
    params = convert_ldm_unet(sd, cfg)
    rs = np.random.RandomState(4)
    x = rs.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([11.0, 700.0], dtype=np.float32)
    ctx = rs.randn(2, 7, 16).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x), torch.from_numpy(t),
                   torch.from_numpy(ctx), extra_info={}).numpy()
    got, _ = unet_apply(params, jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(ctx), cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-4)
