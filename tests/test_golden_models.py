"""Golden parity for model towers against reference torch implementations.

- ArcFace resnet_face18 (`evaluation/arcface_resnet.py`): the identity
  backbone shared by the training align loss and the eval harness —
  random torch weights converted via convert_arcface_state_dict must
  reproduce embeddings exactly.
- CLIPVisionModelWithMask (`adaface/util.py:316-414`): masked CLIP image
  encoder used for fg/bg features in the ID→ada chain.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _ref_path():
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")


@pytest.fixture(scope="module")
def ref_arcface():
    _ref_path()
    try:
        from evaluation.arcface_resnet import resnet_face18
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    return resnet_face18


def test_arcface_matches_reference(ref_arcface):
    from adaface_tpu.models.arcface import (
        arcface_embed, convert_arcface_state_dict)

    torch.manual_seed(0)
    net = ref_arcface(use_se=True).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_arcface_state_dict(sd, use_se=True)

    rs = np.random.RandomState(0)
    x = (rs.rand(2, 1, 128, 128).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(arcface_embed(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3)
    # cosine agreement is what the identity losses consume
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.9999, cos


@pytest.fixture(scope="module")
def ref_masked_clip():
    _ref_path()

    class _Any:
        pass

    def _stub(name, **attrs):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod

    _stub("diffusers", StableDiffusionPipeline=_Any,
          UNet2DConditionModel=_Any, DDIMScheduler=_Any,
          DPMSolverSinglestepScheduler=_Any, AutoencoderKL=_Any)
    _stub("diffusers.models")
    _stub("diffusers.models.unets")
    _stub("diffusers.models.unets.unet_2d_condition",
          UNet2DConditionOutput=_Any)
    _stub("ConsistentID")
    _stub("ConsistentID.lib")
    _stub("ConsistentID.lib.pipeline_ConsistentID", ConsistentIDPipeline=_Any)
    try:
        from adaface.util import CLIPVisionModelWithMask
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    return CLIPVisionModelWithMask


def test_masked_clip_vision_matches_reference(ref_masked_clip):
    """Masked CLIP image encoding: the attention mask derived from the
    downsampled fg mask must produce identical patch features."""
    import transformers

    from adaface_tpu.models.clip import vision_encode
    from adaface_tpu.tools.convert_clip import convert_vision_model

    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=64, patch_size=16,
        projection_dim=32)
    torch.manual_seed(1)
    ref = ref_masked_clip(cfg).eval()
    # shim away kwargs newer transformers dropped from CLIPEncoder.forward
    import inspect

    enc = ref.vision_model.encoder
    orig_fwd = enc.forward
    allowed = set(inspect.signature(orig_fwd).parameters)
    assert "attention_mask" in allowed  # the mask slot the reference uses
    enc.forward = lambda *a, **kw: orig_fwd(
        *a, **{k: v for k, v in kw.items() if k in allowed})
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, our_cfg = convert_vision_model(sd, num_heads=2)

    rs = np.random.RandomState(2)
    pix = rs.randn(1, 3, 64, 64).astype(np.float32)
    mask = np.zeros((1, 64, 64), np.float32)  # [B, H, W] per the reference
    mask[:, 8:40, 16:56] = 1.0

    with torch.no_grad():
        want = ref(torch.from_numpy(pix),
                   attn_mask=torch.from_numpy(mask)
                   ).last_hidden_state.numpy()
    got = np.asarray(vision_encode(
        params, jnp.asarray(pix), our_cfg,
        image_mask=jnp.asarray(mask))["last_hidden_state"])
    np.testing.assert_allclose(got, want, atol=2e-5)
    # and the mask must matter
    with torch.no_grad():
        un = ref(torch.from_numpy(pix),
                 attn_mask=None).last_hidden_state.numpy()
    assert np.abs(un - want).max() > 1e-4


@pytest.fixture(scope="module")
def ref_bisenet():
    _ref_path()
    if "/root/reference/face_parsing" not in sys.path:
        sys.path.append("/root/reference/face_parsing")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.draw_bounding_boxes = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    import torch.utils.model_zoo as modelzoo

    orig = modelzoo.load_url
    modelzoo.load_url = lambda *a, **k: {}  # zero egress: keep random init
    try:
        from model import BiSeNet
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        modelzoo.load_url = orig
    return BiSeNet


def test_bisenet_matches_reference(ref_bisenet):
    """BiSeNet face parser (`face_parsing/model.py`): converted random
    torch weights must reproduce the eval logits exactly."""
    from adaface_tpu.models.bisenet import (
        bisenet_forward, convert_bisenet_state_dict)

    torch.manual_seed(0)
    import torch.utils.model_zoo as modelzoo

    orig = modelzoo.load_url
    modelzoo.load_url = lambda *a, **k: {}
    try:
        net = ref_bisenet(n_classes=19).eval()
    finally:
        modelzoo.load_url = orig
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_bisenet_state_dict(sd)

    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x))[0].numpy()
    got = np.asarray(bisenet_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-4)
    # argmax parsing agreement is what mask generation consumes
    assert (got.argmax(1) == want.argmax(1)).mean() > 0.999


@pytest.fixture(scope="module")
def ref_gma():
    _ref_path()
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    try:
        from gma.network import GMA
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    return GMA


def test_gma_latent_flow_matches_reference(ref_gma):
    """est_flow_from_feats numerical parity: raw-feature correlation
    (radius-4 lookup with the reference's transposed-window channel
    ordering), zero-state update block, convex upsample + resize."""
    from adaface_tpu.models.gma import convert_gma_state_dict, est_flow_from_feats

    torch.manual_seed(3)
    net = ref_gma({"mixed_precision": False, "position_only": False,
                   "position_and_content": False}).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_gma_state_dict(sd)

    rs = np.random.RandomState(4)
    h = w = 16
    c = 24
    f1 = rs.randn(1, c, h * w).astype(np.float32)
    f2 = rs.randn(1, c, h * w).astype(np.float32)
    with torch.no_grad():
        want = net.est_flow_from_feats(
            torch.from_numpy(f1), torch.from_numpy(f2), h, w, num_iters=4,
            corr_normalized_by_sqrt_dim=False).numpy()
    got = np.asarray(est_flow_from_feats(
        params, jnp.asarray(f1), jnp.asarray(f2), h, w, num_iters=4,
        corr_normalized_by_sqrt_dim=False))
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert np.abs(want).max() > 1e-3  # nonzero flow: the test has power


def test_gma_image_flow_matches_reference(ref_gma):
    """Full image path: residual encoders (instance/batch norms), content
    attention, iterative refinement, convex x8 upsampling."""
    from adaface_tpu.models.gma import convert_gma_state_dict, gma_flow

    torch.manual_seed(5)
    net = ref_gma({"mixed_precision": False, "position_only": False,
                   "position_and_content": False}).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_gma_state_dict(sd)

    rs = np.random.RandomState(6)
    # NOTE ≥128px: at 64px the 1/8 grid is 8x8 whose top corr-pyramid
    # level is 1x1, where the reference's grid_sample normalization
    # divides by (size-1)=0 and NaNs; our clamped lookup stays finite
    img1 = (rs.rand(1, 3, 128, 128) * 255).astype(np.float32)
    img2 = np.roll(img1, 2, axis=-1)
    with torch.no_grad():
        _, want = net(torch.from_numpy(img1), torch.from_numpy(img2),
                      num_iters=3, test_mode=1)
    want = want.numpy()
    got = np.asarray(gma_flow(params, jnp.asarray(img1), jnp.asarray(img2),
                              num_iters=3))
    np.testing.assert_allclose(got, want, atol=5e-3)
