"""Golden parity for the ConsistentID image-proj converter.

The trained weights live in ConsistentID-v1.bin as an IP-Adapter
FaceID-Plus `ProjPlusModel` (consumed by the reference at
`adaface/face_id_to_ada_prompt.py:747-765,855-863`). The ConsistentID
package is not installed here, so the oracle is the public ProjPlusModel /
FacePerceiverResampler / PerceiverAttention architecture re-stated in
torch in this test (key-for-key identical state-dict layout); the test
round-trips a randomly-initialized oracle through
`convert_consistentid_proj` and asserts forward parity.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import jax.numpy as jnp

from adaface_tpu.id2ada.layers import apply_proj_plus, init_proj_plus
from adaface_tpu.tools.convert_consistentid import convert_consistentid_proj

import jax


def _reshape_heads(x, heads):
    b, n, d = x.shape
    return x.reshape(b, n, heads, d // heads).transpose(1, 2)


class PerceiverAttention(nn.Module):
    def __init__(self, *, dim, dim_head=64, heads=8):
        super().__init__()
        self.scale = dim_head ** -0.5
        self.dim_head = dim_head
        self.heads = heads
        inner = dim_head * heads
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, latents):
        x = self.norm1(x)
        latents = self.norm2(latents)
        b, l, _ = latents.shape
        q = _reshape_heads(self.to_q(latents), self.heads)
        kv = self.to_kv(torch.cat((x, latents), dim=-2))
        k, v = kv.chunk(2, dim=-1)
        k = _reshape_heads(k, self.heads)
        v = _reshape_heads(v, self.heads)
        s = 1 / math.sqrt(math.sqrt(self.dim_head))
        w = (q * s) @ (k * s).transpose(-2, -1)
        w = torch.softmax(w.float(), dim=-1).type(w.dtype)
        out = (w @ v).permute(0, 2, 1, 3).reshape(b, l, -1)
        return self.to_out(out)


def FeedForward(dim, mult=4):
    inner = int(dim * mult)
    return nn.Sequential(nn.LayerNorm(dim), nn.Linear(dim, inner, bias=False),
                         nn.GELU(), nn.Linear(inner, dim, bias=False))


class FacePerceiverResampler(nn.Module):
    def __init__(self, *, dim, depth, dim_head, heads, embedding_dim,
                 output_dim, ff_mult):
        super().__init__()
        self.proj_in = nn.Linear(embedding_dim, dim)
        self.proj_out = nn.Linear(dim, output_dim)
        self.norm_out = nn.LayerNorm(output_dim)
        self.layers = nn.ModuleList([
            nn.ModuleList([
                PerceiverAttention(dim=dim, dim_head=dim_head, heads=heads),
                FeedForward(dim=dim, mult=ff_mult)])
            for _ in range(depth)])

    def forward(self, latents, x):
        x = self.proj_in(x)
        for attn, ff in self.layers:
            latents = attn(x, latents) + latents
            latents = ff(latents) + latents
        return self.norm_out(self.proj_out(latents))


class ProjPlusModel(nn.Module):
    def __init__(self, cross_attention_dim=768, id_embeddings_dim=512,
                 clip_embeddings_dim=1280, num_tokens=4, depth=4):
        super().__init__()
        self.cross_attention_dim = cross_attention_dim
        self.num_tokens = num_tokens
        self.proj = nn.Sequential(
            nn.Linear(id_embeddings_dim, id_embeddings_dim * 2), nn.GELU(),
            nn.Linear(id_embeddings_dim * 2,
                      cross_attention_dim * num_tokens))
        self.norm = nn.LayerNorm(cross_attention_dim)
        self.perceiver_resampler = FacePerceiverResampler(
            dim=cross_attention_dim, depth=depth, dim_head=64,
            heads=cross_attention_dim // 64,
            embedding_dim=clip_embeddings_dim,
            output_dim=cross_attention_dim, ff_mult=4)

    def forward(self, id_embeds, clip_embeds, shortcut=False, scale=1.0):
        x = self.proj(id_embeds)
        x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
        x = self.norm(x)
        out = self.perceiver_resampler(x, clip_embeds)
        if shortcut:
            out = x + scale * out
        return out


# small dims for speed: dim_head stays 64 (hard-wired in both stacks)
D_OUT, D_ID, D_CLIP, DEPTH = 128, 32, 48, 2


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(5)
    return ProjPlusModel(cross_attention_dim=D_OUT, id_embeddings_dim=D_ID,
                         clip_embeddings_dim=D_CLIP, depth=DEPTH).eval()


def test_consistentid_proj_converter_forward_parity(oracle):
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_consistentid_proj(sd)
    rs = np.random.RandomState(0)
    ids = rs.randn(2, D_ID).astype(np.float32)
    clip = rs.randn(2, 9, D_CLIP).astype(np.float32)
    for shortcut, scale in ((False, 1.0), (True, 0.7)):
        with torch.no_grad():
            want = oracle(torch.from_numpy(ids), torch.from_numpy(clip),
                          shortcut=shortcut, scale=scale).numpy()
        got = np.asarray(apply_proj_plus(
            params, jnp.asarray(ids), jnp.asarray(clip), shortcut=shortcut,
            scale=scale))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_consistentid_proj_converter_accepts_wrapped_dicts(oracle):
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    wrapped = {"image_proj": sd}
    prefixed = {f"image_proj_model.{k}": v for k, v in sd.items()}
    for variant in (wrapped, prefixed):
        params = convert_consistentid_proj(variant)
        assert len(params["resampler"]["layers"]) == DEPTH


def test_init_proj_plus_matches_converted_structure(oracle):
    """Random init and converted params share an identical tree structure,
    so a converted checkpoint drops into ConsistentIDID2AdaPrompt."""
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    conv = convert_consistentid_proj(sd)
    init = init_proj_plus(jax.random.PRNGKey(0), id_dim=D_ID,
                          clip_dim=D_CLIP, out_dim=D_OUT, depth=DEPTH)
    ts = jax.tree_util.tree_structure
    assert ts(conv) == ts(init)
    same_shapes = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, conv, init)
    assert all(jax.tree_util.tree_leaves(same_shapes))
