"""Golden parity tests: adaface_tpu CLIP vs HF transformers (torch, CPU).

Random-initialized torch models (no downloads) are converted with
tools/convert_clip and must match to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from adaface_tpu.models.clip import (
    CLIPTextConfig,
    extend_mkv,
    extend_position_embedding,
    init_text_params,
    layer_multipliers,
    squeeze_mkv,
    text_encode,
    vision_encode,
)
from adaface_tpu.tools.convert_clip import (
    convert_text_model,
    convert_vision_model,
    torch_state_dict_to_numpy,
)


def _small_torch_text():
    cfg = transformers.CLIPTextConfig(
        vocab_size=99,
        hidden_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=256,
        max_position_embeddings=77,
        # the real OpenAI CLIP config has eos_token_id=2, which makes HF use
        # the legacy argmax(input_ids) pooling path the reference relies on
        eos_token_id=2,
    )
    torch.manual_seed(0)
    return transformers.CLIPTextModel(cfg).eval()


def _small_torch_vision(with_proj=False):
    cfg = transformers.CLIPVisionConfig(
        hidden_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=256,
        image_size=32,
        patch_size=8,
        projection_dim=64,
    )
    torch.manual_seed(1)
    cls = (
        transformers.CLIPVisionModelWithProjection
        if with_proj
        else transformers.CLIPVisionModel
    )
    return cls(cfg).eval()


@pytest.fixture(scope="module")
def torch_text():
    return _small_torch_text()


@pytest.fixture(scope="module")
def text_converted(torch_text):
    sd = torch_state_dict_to_numpy(torch_text)
    params, cfg = convert_text_model(sd)
    # toy dims: heads inferred as d//64=2 which matches
    assert cfg.num_heads == 2
    return params, cfg


def test_text_parity(torch_text, text_converted):
    params, cfg = text_converted
    ids = np.array([[49, 3, 7, 2] + [1] * 73, [49, 11, 2] + [1] * 74])
    with torch.no_grad():
        ref = torch_text(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = text_encode(params, jnp.asarray(ids), cfg)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_text_pooled_parity(torch_text, text_converted):
    params, cfg = text_converted
    ids = np.array([[49, 3, 7, 98, 2] + [1] * 72])
    with torch.no_grad():
        ref = torch_text(input_ids=torch.tensor(ids)).pooler_output.numpy()
    out = text_encode(params, jnp.asarray(ids), cfg, return_pooled=True)["pooled"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_text_skip_weights_parity(torch_text, text_converted):
    """CLIP-skip: weighted sum of last-k hidden states pre-final-LN."""
    params, cfg = text_converted
    ids = np.array([[49, 5, 2] + [1] * 74])
    w = np.array([0.2, 0.3, 0.5], np.float32)
    with torch.no_grad():
        hs = torch_text(
            input_ids=torch.tensor(ids), output_hidden_states=True
        ).hidden_states
        mix = sum(wi * h for wi, h in zip(w, hs[-3:]))
        ref = torch_text.text_model.final_layer_norm(mix).numpy()
    out = text_encode(params, jnp.asarray(ids), cfg, skip_weights=jnp.asarray(w))[
        "last_hidden_state"
    ]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_input_embs_injection(text_converted):
    params, cfg = text_converted
    ids = jnp.asarray(np.array([[49, 5, 2] + [1] * 74]))
    embs = params["token_embedding"][ids]
    # injecting the same embeddings must reproduce the id path
    a = text_encode(params, ids, cfg)["last_hidden_state"]
    b = text_encode(params, ids, cfg, input_embs=embs)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # injecting different embeddings must change the output
    # (a constant channel shift would be erased by LayerNorm, so perturb
    # with a non-uniform pattern)
    delta = 0.1 * jnp.sin(jnp.arange(embs.shape[-1]))
    c = text_encode(params, ids, cfg, input_embs=embs + delta)["last_hidden_state"]
    assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-3


def test_mkv_extend_identity_and_squeeze(text_converted):
    params, cfg = text_converted
    ids = jnp.asarray(np.array([[49, 5, 7, 2] + [1] * 73]))
    base = text_encode(params, ids, cfg)["last_hidden_state"]
    # perturb_std=0: duplicated K/V copies are exact, softmax mass just splits
    ext = extend_mkv(params, jax.random.PRNGKey(0), [2] * cfg.num_layers, 0.0)
    assert layer_multipliers(ext, cfg) == [2] * cfg.num_layers
    out = text_encode(ext, ids, cfg)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
    # squeeze back to multiplier 1 restores the original weights
    sq = squeeze_mkv(ext, [2] * cfg.num_layers)
    out2 = text_encode(sq, ids, cfg)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(base), atol=1e-5)


def test_mkv_extend_perturbed_changes_output(text_converted):
    params, cfg = text_converted
    ids = jnp.asarray(np.array([[49, 5, 7, 2] + [1] * 73]))
    base = text_encode(params, ids, cfg)["last_hidden_state"]
    ext = extend_mkv(params, jax.random.PRNGKey(0), [4] * cfg.num_layers, 0.2)
    out = text_encode(ext, ids, cfg)["last_hidden_state"]
    diff = np.abs(np.asarray(out) - np.asarray(base)).max()
    assert 1e-4 < diff < 10.0


def test_extend_position_embedding():
    cfg = CLIPTextConfig(vocab_size=50, hidden_size=128, num_layers=2, num_heads=2,
                         intermediate_size=256)
    params = init_text_params(jax.random.PRNGKey(0), cfg)
    ext = extend_position_embedding(params, 97)
    assert ext["position_embedding"].shape[0] == 97
    np.testing.assert_allclose(
        np.asarray(ext["position_embedding"][77:]),
        np.asarray(params["position_embedding"][-20:]),
    )
    ids = jnp.zeros((1, 97), jnp.int32)
    out = text_encode(ext, ids, cfg)["last_hidden_state"]
    assert out.shape == (1, 97, 128)


def test_vision_parity():
    model = _small_torch_vision()
    sd = torch_state_dict_to_numpy(model)
    params, cfg = convert_vision_model(sd)
    px = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    out = vision_encode(params, jnp.asarray(px), cfg)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_vision_projection_parity():
    model = _small_torch_vision(with_proj=True)
    sd = torch_state_dict_to_numpy(model)
    params, cfg = convert_vision_model(sd)
    px = np.random.RandomState(1).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px)).image_embeds.numpy()
    out = vision_encode(params, jnp.asarray(px), cfg)["image_embeds"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_vision_mask_blocks_masked_patches():
    """mask_mode='hard': kept-token outputs must not depend on pixels
    inside masked patches (the reference-default 'soft_pair' mode is a +1
    logit bias and is golden-tested in test_golden_models.py)."""
    model = _small_torch_vision()
    sd = torch_state_dict_to_numpy(model)
    params, cfg = convert_vision_model(sd)
    rs = np.random.RandomState(2)
    px = rs.randn(1, 3, 32, 32).astype(np.float32)
    mask = np.ones((1, 32, 32), np.float32)
    mask[:, :, 16:] = 0.0  # mask right half
    out1 = vision_encode(params, jnp.asarray(px), cfg,
                         image_mask=jnp.asarray(mask), mask_mode="hard")
    px2 = px.copy()
    px2[:, :, :, 16:] = rs.randn(1, 3, 32, 16)  # scramble masked region
    out2 = vision_encode(params, jnp.asarray(px2), cfg,
                         image_mask=jnp.asarray(mask), mask_mode="hard")
    np.testing.assert_allclose(
        np.asarray(out1["pooled"]), np.asarray(out2["pooled"]), atol=1e-5
    )
    assert out1["token_mask"].shape == (1, 17, 1)
