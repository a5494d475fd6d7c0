"""Golden weight-parity for the SD3 MMDiT (VERDICT r3 #6).

diffusers is not installed in this image, so the oracle is an
INDEPENDENT torch reimplementation of `SD3Transformer2DModel` written
against the published semantics (Esser et al. 2024; diffusers
`transformer_sd3.py` / `attention.py` / `embeddings.py` layouts):

- module names reproduce the diffusers state-dict keys exactly
  (`transformer_blocks.N.attn.to_q`, `norm1.linear`, `ff.net.0.proj`,
  `pos_embed.proj`, `time_text_embed.timestep_embedder.linear_1`, …), so
  `tools/convert_mmdit.convert_mmdit` runs on its real key layout;
- AdaLN-zero chunk order [shift, scale, gate]×2, AdaLN-continuous
  [scale, shift], joint attention with context appended after the
  latent stream, tanh-approximate GELU FF, final context_pre_only
  block — each a convention that silently breaks identity if flipped.

The pos_embed table is RANDOM (registered buffer) rather than sin/cos:
`mmdit_apply` must consume the checkpoint's own table, so a random one
catches any fallback to the recomputed convention.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import jax.numpy as jnp

from adaface_tpu.models.mmdit import MMDiTConfig, mmdit_apply
from adaface_tpu.tools.convert_mmdit import convert_mmdit

CFG = MMDiTConfig(
    patch_size=2,
    in_channels=4,
    out_channels=4,
    depth=3,
    hidden=64,
    num_heads=2,
    context_dim=32,
    pooled_dim=48,
    pos_embed_max_size=8,
    time_embed_dim=32,
)


class _TimestepEmbedder(nn.Module):
    def __init__(self, in_dim, hidden):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden)
        self.linear_2 = nn.Linear(hidden, hidden)

    def forward(self, x):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(x)))


class _TimeTextEmbed(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.timestep_embedder = _TimestepEmbedder(cfg.time_embed_dim,
                                                   cfg.hidden)
        self.text_embedder = _TimestepEmbedder(cfg.pooled_dim, cfg.hidden)
        self._fdim = cfg.time_embed_dim

    def forward(self, t, pooled):
        half = self._fdim // 2
        freqs = torch.exp(-math.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        four = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.timestep_embedder(four) + self.text_embedder(pooled)


class _PatchEmbed(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        p = cfg.patch_size
        self.proj = nn.Conv2d(cfg.in_channels, cfg.hidden, p, stride=p)
        m = cfg.pos_embed_max_size
        torch.manual_seed(123)
        self.register_buffer("pos_embed",
                             torch.randn(1, m * m, cfg.hidden) * 0.02)
        self._m = m

    def forward(self, x):
        b = x.shape[0]
        h = self.proj(x)  # [B, hidden, gh, gw]
        gh, gw = h.shape[2], h.shape[3]
        lat = h.flatten(2).transpose(1, 2)  # [B, gh*gw, hidden]
        tab = self.pos_embed.reshape(self._m, self._m, -1)
        top, left = (self._m - gh) // 2, (self._m - gw) // 2
        pos = tab[top:top + gh, left:left + gw].reshape(1, gh * gw, -1)
        return lat + pos


class _AdaLNZero(nn.Module):
    def __init__(self, hidden, n_chunks=6):
        super().__init__()
        self.linear = nn.Linear(hidden, n_chunks * hidden)

    def forward(self, emb):
        return self.linear(torch.nn.functional.silu(emb))


class _FF(nn.Module):
    """diffusers FeedForward("gelu-approximate"): net.0.proj, net.2."""

    def __init__(self, hidden, mult=4.0):
        super().__init__()
        inner = int(hidden * mult)

        class _GELU(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(hidden, inner)

            def forward(self, x):
                return torch.nn.functional.gelu(self.proj(x),
                                                approximate="tanh")

        self.net = nn.ModuleList([_GELU(), nn.Dropout(0.0),
                                  nn.Linear(inner, hidden)])

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


class _JointAttn(nn.Module):
    def __init__(self, cfg, pre_only):
        super().__init__()
        h = cfg.hidden
        self.to_q = nn.Linear(h, h)
        self.to_k = nn.Linear(h, h)
        self.to_v = nn.Linear(h, h)
        self.add_q_proj = nn.Linear(h, h)
        self.add_k_proj = nn.Linear(h, h)
        self.add_v_proj = nn.Linear(h, h)
        self.to_out = nn.ModuleList([nn.Linear(h, h), nn.Dropout(0.0)])
        if not pre_only:
            self.to_add_out = nn.Linear(h, h)
        self._nh = cfg.num_heads
        self._pre_only = pre_only

    def forward(self, x, ctx):
        b, n, h = x.shape
        nh, hd = self._nh, h // self._nh

        def heads(t):
            return t.reshape(b, -1, nh, hd).transpose(1, 2)

        q = torch.cat([heads(self.to_q(x)), heads(self.add_q_proj(ctx))], 2)
        k = torch.cat([heads(self.to_k(x)), heads(self.add_k_proj(ctx))], 2)
        v = torch.cat([heads(self.to_v(x)), heads(self.add_v_proj(ctx))], 2)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), -1)
        out = (probs @ v).transpose(1, 2).reshape(b, -1, h)
        out_x, out_c = out[:, :n], out[:, n:]
        out_x = self.to_out[0](out_x)
        if not self._pre_only:
            out_c = self.to_add_out(out_c)
        return out_x, out_c


def _mod(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


class _JointBlock(nn.Module):
    def __init__(self, cfg, pre_only):
        super().__init__()
        h = cfg.hidden
        self.norm1 = _AdaLNZero(h, 6)
        self.norm1_context = _AdaLNZero(h, 2 if pre_only else 6)
        self.attn = _JointAttn(cfg, pre_only)
        self.ff = _FF(h, cfg.mlp_ratio)
        if not pre_only:
            self.ff_context = _FF(h, cfg.mlp_ratio)
        self._pre_only = pre_only
        self._ln = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)

    def forward(self, x, ctx, emb):
        mx = self.norm1(emb)
        sx, cx, gx, sm, cm, gm = mx.chunk(6, dim=-1)
        mc = self.norm1_context(emb)
        if self._pre_only:
            c_scale, c_shift = mc.chunk(2, dim=-1)  # AdaLN-continuous order
            ctx_in = _mod(self._ln(ctx), c_shift, c_scale)
        else:
            cs, cc, cg, csm, ccm, cgm = mc.chunk(6, dim=-1)
            ctx_in = _mod(self._ln(ctx), cs, cc)
        x_in = _mod(self._ln(x), sx, cx)
        ax, ac = self.attn(x_in, ctx_in)
        x = x + gx[:, None] * ax
        x = x + gm[:, None] * self.ff(_mod(self._ln(x), sm, cm))
        if self._pre_only:
            return x, ctx
        ctx = ctx + cg[:, None] * ac
        ctx = ctx + cgm[:, None] * self.ff_context(
            _mod(self._ln(ctx), csm, ccm))
        return x, ctx


class TorchMMDiT(nn.Module):
    """diffusers `SD3Transformer2DModel` semantics + key layout."""

    def __init__(self, cfg):
        super().__init__()
        self.pos_embed = _PatchEmbed(cfg)
        self.time_text_embed = _TimeTextEmbed(cfg)
        self.context_embedder = nn.Linear(cfg.context_dim, cfg.hidden)
        self.transformer_blocks = nn.ModuleList([
            _JointBlock(cfg, pre_only=(i == cfg.depth - 1))
            for i in range(cfg.depth)])

        class _NormOut(nn.Module):
            def __init__(self, h):
                super().__init__()
                self.linear = nn.Linear(h, 2 * h)
                self._ln = nn.LayerNorm(h, elementwise_affine=False,
                                        eps=1e-6)

            def forward(self, x, emb):
                scale, shift = self.linear(
                    torch.nn.functional.silu(emb)).chunk(2, dim=-1)
                return _mod(self._ln(x), shift, scale)

        self.norm_out = _NormOut(cfg.hidden)
        p = cfg.patch_size
        self.proj_out = nn.Linear(cfg.hidden,
                                  p * p * cfg.out_channels)
        self._cfg = cfg

    def forward(self, x, t, context, pooled):
        cfg = self._cfg
        b, c, hh, ww = x.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        lat = self.pos_embed(x)
        emb = self.time_text_embed(t, pooled)
        ctx = self.context_embedder(context)
        for blk in self.transformer_blocks:
            lat, ctx = blk(lat, ctx, emb)
        lat = self.norm_out(lat, emb)
        out = self.proj_out(lat)  # [B, gh*gw, p*p*C]
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        return out.permute(0, 5, 1, 3, 2, 4).reshape(
            b, cfg.out_channels, gh * p, gw * p)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(21)
    return TorchMMDiT(CFG).eval()


@pytest.fixture(scope="module")
def converted(oracle):
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    assert "pos_embed.pos_embed" in sd  # the buffer must persist
    return convert_mmdit(sd, CFG)


def test_mmdit_matches_torch_oracle(oracle, converted):
    rs = np.random.RandomState(31)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([17.0, 803.0], dtype=np.float32)
    ctx = rs.randn(2, 11, 32).astype(np.float32)
    pooled = rs.randn(2, 48).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(ctx), torch.from_numpy(pooled)).numpy()
    got = mmdit_apply(converted, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(ctx), jnp.asarray(pooled), CFG)
    assert got.shape == want.shape == (2, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_mmdit_uses_checkpoint_pos_table(oracle, converted):
    """Dropping the converted pos table must CHANGE the output — proof
    the forward consumed the checkpoint's own table, not a recomputed
    sin/cos fallback."""
    rs = np.random.RandomState(32)
    x = rs.randn(1, 4, 8, 8).astype(np.float32)
    t = np.array([99.0], dtype=np.float32)
    ctx = rs.randn(1, 7, 32).astype(np.float32)
    pooled = rs.randn(1, 48).astype(np.float32)
    with_table = mmdit_apply(converted, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(ctx), jnp.asarray(pooled), CFG)
    no_table = {k: v for k, v in converted.items() if k != "pos_embed_table"}
    without = mmdit_apply(no_table, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), jnp.asarray(pooled), CFG)
    assert float(jnp.abs(with_table - without).max()) > 1e-4


def test_export_roundtrip(oracle, converted):
    """convert → export → convert must be the identity on every leaf."""
    from adaface_tpu.tools.convert_mmdit import export_mmdit_to_diffusers

    sd2 = export_mmdit_to_diffusers(converted, CFG)
    again = convert_mmdit(sd2, CFG)
    import jax

    leaves1 = jax.tree_util.tree_leaves(converted)
    leaves2 = jax.tree_util.tree_leaves(again)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))