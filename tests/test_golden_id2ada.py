"""Golden parity for the Arc2Face ID→image-prompt mapping.

`Arc2Face_ID2AdaPrompt.map_init_id_to_img_prompt_embs`
(`adaface/face_id_to_ada_prompt.py:680-723`): the 512-d ArcFace embedding
is zero-padded to hidden size, written over the `id` token of the
template "photo of a id person" (position 4, max_length 22), passed
through the Arc2Face CLIP text encoder, and tokens 4:20 are the image
prompt. Both sides get identical tiny encoder weights and template ids.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from adaface_tpu.id2ada.face_id_to_ada_prompt import Arc2FaceID2AdaPrompt
from adaface_tpu.tools.convert_clip import convert_text_model

MAXLEN = 22
ID_TOK = 13


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class FakeTokenizer:
    pad_token_id = 2

    def encode(self, text, add_special_tokens=False):
        assert text == "id"
        return [ID_TOK]

    def __call__(self, prompts, truncation=True, padding="max_length",
                 max_length=MAXLEN, return_tensors="pt"):
        if isinstance(prompts, str):
            prompts = [prompts]
        row = [3, 10, 11, 12, ID_TOK, 14, 2]
        row += [self.pad_token_id] * (max_length - len(row))
        out = types.SimpleNamespace()
        out.input_ids = torch.tensor([row] * len(prompts), dtype=torch.long)
        return out


@pytest.fixture(scope="module")
def pair():
    from tests.golden_utils import stub_reference_deps

    stub_reference_deps()
    try:
        import adaface.face_id_to_ada_prompt as ref_mod
        from adaface.arc2face_models import CLIPTextModelWrapper
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference import failed: {e}")

    # tiny encoder with hidden >= 20 so the 512-d pad truncation branch is
    # avoided on the reference side: use hidden 32 and 24-d "arcface" embs
    ccfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=MAXLEN, eos_token_id=2)
    torch.manual_seed(0)
    wrapper = CLIPTextModelWrapper(ccfg).eval()
    import inspect

    enc = wrapper.text_model.encoder
    orig_fwd = enc.forward
    allowed = set(inspect.signature(orig_fwd).parameters)
    enc.forward = lambda *a, **kw: orig_fwd(
        *a, **{k: v for k, v in kw.items() if k in allowed})

    ref = ref_mod.Arc2Face_ID2AdaPrompt.__new__(
        ref_mod.Arc2Face_ID2AdaPrompt)
    torch.nn.Module.__init__(ref)
    ref.tokenizer = FakeTokenizer()
    ref.text_to_image_prompt_encoder = wrapper
    ref.dtype = torch.float32
    ref.id_img_prompt_max_length = MAXLEN

    sd = {k: v.numpy() for k, v in wrapper.state_dict().items()}
    params, clip_cfg = convert_text_model(sd, num_heads=2)
    ours = Arc2FaceID2AdaPrompt.__new__(Arc2FaceID2AdaPrompt)
    ours.text_cfg = clip_cfg
    ours.text_encoder_params = params
    ours._id_pos = 4
    ours._template_ids = np.asarray(
        FakeTokenizer()("x", max_length=MAXLEN).input_ids[0])
    return ref, ours


def test_map_init_id_matches(pair):
    ref, ours = pair
    rs = np.random.RandomState(5)
    # "arcface" embeddings narrower than hidden so F.pad zero-pads
    ids = rs.randn(3, 24).astype(np.float32)
    ids /= np.linalg.norm(ids, axis=-1, keepdims=True)
    with torch.no_grad():
        want = ref.map_init_id_to_img_prompt_embs(
            torch.from_numpy(ids)).numpy()
    got = np.asarray(ours.map_init_id_to_img_prompt_embs(jnp.asarray(ids)))
    assert got.shape == want.shape == (3, 16, 32)
    np.testing.assert_allclose(got, want, atol=2e-5)
