"""Golden parity against the REFERENCE torch implementation.

SURVEY.md "hard parts" #1: the ada-embedding chain has many subtle
slice/interleave conventions. These tests import the reference's
`adaface.arc2face_models.CLIPTextModelWrapper` (torch, CPU, read-only —
diffusers/ConsistentID stubbed) as the oracle and check bit-level
agreement of:

- CLIP-skip (hidden_state_layer_weights weighted sum of last-k PRE-final-LN
  hidden states, weights normalized across layers)
- input-token-embedding injection (input_token_embs)
- MKV K/V extension (token-interleaved multiplier copies) with
  perturb_std=0 so the comparison is deterministic
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from adaface_tpu.models.clip import extend_mkv, text_encode
from adaface_tpu.tools.convert_clip import convert_text_model


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_wrapper_cls():
    """Import the reference CLIPTextModelWrapper with heavy deps stubbed."""
    class _Any:
        pass

    _stub("diffusers", StableDiffusionPipeline=_Any,
          UNet2DConditionModel=_Any, DDIMScheduler=_Any,
          DPMSolverSinglestepScheduler=_Any, AutoencoderKL=_Any)
    _stub("diffusers.models")
    _stub("diffusers.models.unets")
    _stub("diffusers.models.unets.unet_2d_condition",
          UNet2DConditionOutput=_Any)
    _stub("ConsistentID")
    _stub("ConsistentID.lib")
    _stub("ConsistentID.lib.pipeline_ConsistentID",
          ConsistentIDPipeline=_Any)
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    try:
        from adaface.arc2face_models import CLIPTextModelWrapper
    except Exception as e:  # incompatible transformers etc.
        pytest.skip(f"reference import failed: {e}")
    return CLIPTextModelWrapper


@pytest.fixture(scope="module")
def small_pair(ref_wrapper_cls):
    """(reference wrapper, our params, our cfg) with identical weights."""
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=16, eos_token_id=2)
    torch.manual_seed(0)
    ref = ref_wrapper_cls(cfg).eval()
    # newer transformers dropped return_dict/output_* kwargs from
    # CLIPEncoder.forward; shim them away so the reference wrapper
    # (written against the older API) still runs
    import inspect

    enc = ref.text_model.encoder
    orig_fwd = enc.forward
    allowed = set(inspect.signature(orig_fwd).parameters)

    def fwd(*a, **kw):
        return orig_fwd(*a, **{k: v for k, v in kw.items() if k in allowed})

    enc.forward = fwd
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, our_cfg = convert_text_model(sd, num_heads=2)
    return ref, params, our_cfg


IDS = np.array([[0, 5, 7, 9, 2, 1, 1, 1]], np.int64)


def test_last_hidden_state_matches(small_pair):
    ref, params, cfg = small_pair
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(IDS)).last_hidden_state.numpy()
    got = np.asarray(text_encode(params, jnp.asarray(IDS), cfg)
                     ["last_hidden_state"])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_clip_skip_weights_match(small_pair):
    """hidden_state_layer_weights: normalized sum over the last-k PRE-LN
    hidden states, then final LN (`arc2face_models.py:292-308`)."""
    ref, params, cfg = small_pair
    w = torch.tensor([[1.0], [2.0], [4.0]])
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(IDS),
                   hidden_state_layer_weights=w).last_hidden_state.numpy()
    got = np.asarray(text_encode(
        params, jnp.asarray(IDS), cfg,
        skip_weights=jnp.asarray([1.0, 2.0, 4.0]))["last_hidden_state"])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_input_emb_injection_matches(small_pair):
    """input_token_embs overrides the token-embedding lookup
    (`arc2face_models.py:244-268`)."""
    ref, params, cfg = small_pair
    rs = np.random.RandomState(1)
    embs = rs.randn(1, IDS.shape[1], 32).astype(np.float32)
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(IDS),
                   input_token_embs=torch.from_numpy(embs)
                   ).last_hidden_state.numpy()
    got = np.asarray(text_encode(params, jnp.asarray(IDS), cfg,
                                 input_embs=jnp.asarray(embs))
                     ["last_hidden_state"])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mkv_extension_matches(small_pair):
    """extend_clip_attention_MKV_multiplier: K/V rows repeated whole-block,
    multiplier tucked into seq_len (`arc2face_models.py:82-127,144-231`).
    perturb_std=0 extension is output-INVARIANT (duplicated keys halve the
    softmax weights), so to give the test power we perturb the extra
    copies identically on both sides and require (a) agreement and (b) a
    real deviation from the unextended output."""
    ref, params, cfg = small_pair
    import copy
    import inspect

    d = 32
    ref2 = copy.deepcopy(ref)
    enc = ref2.text_model.encoder
    orig_fwd = type(enc).forward.__get__(enc)
    allowed = set(inspect.signature(orig_fwd).parameters)
    enc.forward = lambda *a, **kw: orig_fwd(
        *a, **{k: v for k, v in kw.items() if k in allowed})

    n = ref2.extend_clip_attention_MKV_multiplier([2, 1, 1], perturb_std=0)
    assert n == 1
    rs = np.random.RandomState(3)
    dk = rs.randn(d, d).astype(np.float32) * 0.05
    dv = rs.randn(d, d).astype(np.float32) * 0.05
    attn0 = ref2.text_model.encoder.layers[0].self_attn
    with torch.no_grad():
        attn0.k_proj.weight[d:] += torch.from_numpy(dk)
        attn0.v_proj.weight[d:] += torch.from_numpy(dv)
        want = ref2(input_ids=torch.from_numpy(IDS)).last_hidden_state.numpy()

    ours = extend_mkv(params, jax.random.PRNGKey(0), [2, 1, 1],
                      perturb_std=0.0)
    ours = jax.tree_util.tree_map(lambda x: x, ours)  # fresh containers
    # torch weight rows [D:2D] of [mult*D, D] ↔ our columns [D:2D] of
    # [D, mult*D] (HF (out,in) vs our (in,out))
    l0 = ours["layers"][0]["attn"]
    l0["k"]["w"] = l0["k"]["w"].at[:, d:].add(jnp.asarray(dk.T))
    l0["v"]["w"] = l0["v"]["w"].at[:, d:].add(jnp.asarray(dv.T))
    got = np.asarray(text_encode(ours, jnp.asarray(IDS), cfg)
                     ["last_hidden_state"])
    base = np.asarray(text_encode(params, jnp.asarray(IDS), cfg)
                      ["last_hidden_state"])
    assert np.abs(want - base).max() > 1e-3  # the perturbation has power
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_squeeze_inverts_extension(small_pair):
    """squeeze after noise-free extension must reproduce the original."""
    ref, params, cfg = small_pair
    from adaface_tpu.models.clip import squeeze_mkv

    ext = extend_mkv(params, jax.random.PRNGKey(0), [2, 2, 2],
                     perturb_std=0.0)
    back = squeeze_mkv(ext, [2, 2, 2])
    base = np.asarray(text_encode(params, jnp.asarray(IDS), cfg)
                      ["last_hidden_state"])
    got = np.asarray(text_encode(back, jnp.asarray(IDS), cfg)
                     ["last_hidden_state"])
    np.testing.assert_allclose(got, base, atol=2e-5)
