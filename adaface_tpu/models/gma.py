"""GMA (RAFT + Global Motion Aggregation) optical flow, functional JAX.

Rebuild of `gma/` (network.py / extractor.py / corr.py / update.py /
gma.py) with the EXACT RAFT-GMA architecture and dims, so the reference's
frozen `models/gma-sintel.pth` weights port directly
(`convert_gma_state_dict`): residual BasicEncoders (instance-norm fnet,
batch-norm cnet), parameter-free all-pairs correlation pyramid
(levels=4, radius=4 → 324 lookup planes), content-only intra-frame
attention over the context features, BasicMotionEncoder → Aggregate →
SepConvGRU → FlowHead update block, and learned convex ×8 upsampling.

The live use in the reference training is latent-feature flow for the
elastic-matching loss (`est_flow_from_feats`, called from
`reconstruct_feat_with_matching_flow`, `ldm/util.py:2284-2312`; enabled by
`--use_face_flow_for_sc_matching_loss`, default off). Matching the
reference, that path runs the correlation block on the RAW features
(parameter-free, any channel count) with ZERO hidden/context state — so
only the pretrained update block drives the refinement and the attention
is uniform (`gma/network.py:172-264`). Entry points:

- `est_flow_from_feats(params, fmap1, fmap2, h, w, num_iters)` — flow
  from arbitrary [B, C, N] feature maps.
- `gma_flow(params, img1, img2)` — image-level flow (RAFT protocol,
  uint8-range [B,3,H,W] inputs).

Plus the warping utilities the loss library needs:
`backward_warp_by_flow`, `smooth_flow`, `flow2attn`.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp

Params = dict[str, Any]

HDIM = 128  # GRU hidden dim
CDIM = 128  # context dim
CORR_LEVELS = 4
CORR_RADIUS = 4
NUM_HEADS = 1  # `network.py:33-34`


def _conv_init(rng, kh, kw, cin, cout, bias=True):
    std = math.sqrt(2.0 / (kh * kw * cin))
    p = {"w": jax.random.normal(rng, (kh, kw, cin, cout)) * std}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _conv(p, x, stride=1, padding=None):
    kh, kw = p["w"].shape[:2]
    if padding is None:
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    else:
        pad = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# norms (torch parity: InstanceNorm2d affine=False; BatchNorm2d eval mode)
# ---------------------------------------------------------------------------


def _norm_init(kind: str, ch: int):
    if kind == "instance" or kind == "none":
        return {}
    if kind == "batch":
        return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}
    raise ValueError(kind)


def _norm(p, x, kind: str, eps: float = 1e-5):
    if kind == "none":
        return x
    if kind == "instance":
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    # batch (inference: running stats)
    return ((x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
            * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# BasicEncoder (extractor.py: conv7x7/2 → 3 residual stages → conv1x1)
# ---------------------------------------------------------------------------


def _resblock_init(ks, cin, cout, stride, kind):
    p = {
        "conv1": _conv_init(next(ks), 3, 3, cin, cout),
        "conv2": _conv_init(next(ks), 3, 3, cout, cout),
        "n1": _norm_init(kind, cout),
        "n2": _norm_init(kind, cout),
    }
    if stride != 1:
        p["down"] = _conv_init(next(ks), 1, 1, cin, cout)
        p["n3"] = _norm_init(kind, cout)
    return p


def _resblock(p, x, stride, kind):
    y = jax.nn.relu(_norm(p["n1"], _conv(p["conv1"], x, stride=stride), kind))
    y = jax.nn.relu(_norm(p["n2"], _conv(p["conv2"], y), kind))
    if "down" in p:
        x = _norm(p["n3"], _conv(p["down"], x, stride=stride, padding=0), kind)
    return jax.nn.relu(x + y)


def _encoder_init(rng, out_dim: int, kind: str) -> Params:
    ks = iter(jax.random.split(rng, 24))
    return {
        "conv1": _conv_init(next(ks), 7, 7, 3, 64),
        "n1": _norm_init(kind, 64),
        "layer1": [_resblock_init(ks, 64, 64, 1, kind),
                   _resblock_init(ks, 64, 64, 1, kind)],
        "layer2": [_resblock_init(ks, 64, 96, 2, kind),
                   _resblock_init(ks, 96, 96, 1, kind)],
        "layer3": [_resblock_init(ks, 96, 128, 2, kind),
                   _resblock_init(ks, 128, 128, 1, kind)],
        "conv2": _conv_init(next(ks), 1, 1, 128, out_dim),
    }


def _encoder(p, x, kind: str):
    h = jax.nn.relu(_norm(p["n1"], _conv(p["conv1"], x, stride=2), kind))
    for i, layer in enumerate(("layer1", "layer2", "layer3")):
        h = _resblock(p[layer][0], h, 1 if i == 0 else 2, kind)
        h = _resblock(p[layer][1], h, 1, kind)
    return _conv(p["conv2"], h, padding=0)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_gma_params(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 32))
    corr_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2  # 324
    return {
        "fnet": _encoder_init(next(ks), 256, "instance"),
        "cnet": _encoder_init(next(ks), HDIM + CDIM, "batch"),
        # content-only intra-frame attention (`gma.py:53-108`; the relative
        # positional embedding branch is off in the shipped config, and in
        # the latent path q is zero so attention is uniform regardless)
        "att": {"to_qk": _conv_init(next(ks), 1, 1, CDIM,
                                    2 * NUM_HEADS * 128, bias=False)},
        "update": {
            "menc": {
                "convc1": _conv_init(next(ks), 1, 1, corr_planes, 256),
                "convc2": _conv_init(next(ks), 3, 3, 256, 192),
                "convf1": _conv_init(next(ks), 7, 7, 2, 128),
                "convf2": _conv_init(next(ks), 3, 3, 128, 64),
                "conv": _conv_init(next(ks), 3, 3, 256, 126),
            },
            "agg": {"to_v": _conv_init(next(ks), 1, 1, 128,
                                       NUM_HEADS * 128, bias=False),
                    "gamma": jnp.zeros((1,))},
            "gru": {  # SepConvGRU: 1x5 then 5x1 stages
                k: _conv_init(next(ks), *kshape, HDIM + CDIM + 256, HDIM)
                for k, kshape in (("z1", (1, 5)), ("r1", (1, 5)),
                                  ("q1", (1, 5)), ("z2", (5, 1)),
                                  ("r2", (5, 1)), ("q2", (5, 1)))
            },
            "flow_head": {
                "conv1": _conv_init(next(ks), 3, 3, HDIM, 256),
                "conv2": _conv_init(next(ks), 3, 3, 256, 2),
            },
            "mask": {
                "conv1": _conv_init(next(ks), 3, 3, 128, 256),
                "conv2": _conv_init(next(ks), 1, 1, 256, 64 * 9),
            },
        },
    }


# ---------------------------------------------------------------------------
# correlation pyramid (parameter-free; corr.py CorrBlock)
# ---------------------------------------------------------------------------


def _corr_pyramid(f1, f2, normalized_by_sqrt_dim=True):
    """All-pairs correlation → CORR_LEVELS pooled volumes.

    f1, f2: [B, H, W, C] → list of [B*H*W, H/2^l, W/2^l]."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bijc,bklc->bijkl", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / (math.sqrt(c) if normalized_by_sqrt_dim else 1.0)
    cur = corr.reshape(b * h * w, h, w, 1)
    pyramid = [cur]
    for _ in range(CORR_LEVELS - 1):
        cur = jax.lax.reduce_window(
            cur, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        pyramid.append(cur)
    return pyramid, (b, h, w)


def _bilinear_sample_zeropad(img, x, y):
    """img [N, H, W]; x/y sample coords [N, K] → [N, K], zeros outside
    (torch grid_sample align_corners=True, padding_mode='zeros')."""
    n, h, w = img.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)

    def take(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take_along_axis(img.reshape(n, h * w), idx, axis=-1)
        return v * valid

    wx = x - x0
    wy = y - y0
    return (take(y0, x0) * (1 - wx) * (1 - wy)
            + take(y0, x0 + 1) * wx * (1 - wy)
            + take(y0 + 1, x0) * (1 - wx) * wy
            + take(y0 + 1, x0 + 1) * wx * wy)


def _corr_lookup(pyramid, shape, coords):
    """Sample each level in a (2r+1)² window (corr.py `__call__`).

    coords [B, H, W, 2] (x, y) in level-0 units → [B, H, W, L*(2r+1)²].
    NOTE the reference adds a (dy, dx)-ordered delta to (x, y)-ordered
    coords (`corr.py:44-50`) — the window is transposed relative to its
    channel naming; replicated exactly so ported weights line up."""
    b, h, w = shape
    r = CORR_RADIUS
    k = 2 * r + 1
    d0 = jnp.repeat(jnp.arange(-r, r + 1.0), k)  # first meshgrid dim
    d1 = jnp.tile(jnp.arange(-r, r + 1.0), k)
    outs = []
    for lvl, corr in enumerate(pyramid):
        ch, cw = corr.shape[1:3]
        c = coords.reshape(b * h * w, 1, 2) / (2 ** lvl)
        # x += delta's first (dy-named) component, y += second — `corr.py:50`
        x = c[..., 0] + d0[None]
        y = c[..., 1] + d1[None]
        outs.append(_bilinear_sample_zeropad(corr[..., 0], x, y))
    out = jnp.concatenate(outs, axis=-1)  # [B*H*W, L*K²]
    return out.reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# attention + update block (gma.py / update.py)
# ---------------------------------------------------------------------------


def _attention(p, inp):
    """Content-only intra-frame attention → [B, heads, N, N]."""
    b, h, w, _ = inp.shape
    qk = _conv(p["to_qk"], inp, padding=0)
    q, k = jnp.split(qk.reshape(b, h * w, NUM_HEADS, 2 * 128), 2, axis=-1)
    q = q.transpose(0, 2, 1, 3) * (128 ** -0.5)
    k = k.transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                     preferred_element_type=jnp.float32)
    return jax.nn.softmax(sim, axis=-1).astype(inp.dtype)


def _aggregate(p, attn, motion):
    """Global motion aggregation (`gma.py:111-160`): motion + γ·attn·V."""
    b, h, w, c = motion.shape
    v = _conv(p["to_v"], motion, padding=0).reshape(b, h * w, NUM_HEADS, 128)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    out = out.reshape(b, h, w, NUM_HEADS * 128)
    return motion + p["gamma"] * out


def _sep_conv_gru(p, hidden, x):
    for suffix in ("1", "2"):
        hx = jnp.concatenate([hidden, x], axis=-1)
        z = jax.nn.sigmoid(_conv(p["z" + suffix], hx))
        r = jax.nn.sigmoid(_conv(p["r" + suffix], hx))
        q = jnp.tanh(_conv(p["q" + suffix],
                           jnp.concatenate([r * hidden, x], axis=-1)))
        hidden = (1 - z) * hidden + z * q
    return hidden


def _update_block(p, hidden, inp, corr, flow, attn):
    """GMAUpdateBlock (`update.py:113-146`) → (hidden, up_mask, dflow)."""
    m = p["menc"]
    cor = jax.nn.relu(_conv(m["convc1"], corr, padding=0))
    cor = jax.nn.relu(_conv(m["convc2"], cor))
    flo = jax.nn.relu(_conv(m["convf1"], flow))
    flo = jax.nn.relu(_conv(m["convf2"], flo))
    motion = jax.nn.relu(_conv(m["conv"], jnp.concatenate([cor, flo], -1)))
    motion = jnp.concatenate([motion, flow], axis=-1)  # 128 ch
    motion_global = _aggregate(p["agg"], attn, motion)
    x = jnp.concatenate([inp, motion, motion_global], axis=-1)
    hidden = _sep_conv_gru(p["gru"], hidden, x)
    dflow = _conv(p["flow_head"]["conv2"],
                  jax.nn.relu(_conv(p["flow_head"]["conv1"], hidden)))
    mask = 0.25 * _conv(p["mask"]["conv2"],
                        jax.nn.relu(_conv(p["mask"]["conv1"], hidden)),
                        padding=0)
    return hidden, mask, dflow


def _upsample_flow_convex(flow, mask):
    """Learned convex ×8 upsampling (`network.py:65-76`).

    flow [B, H, W, 2]; mask [B, H, W, 576] → [B, 8H, 8W, 2]."""
    b, h, w, _ = flow.shape
    mask = jax.nn.softmax(mask.reshape(b, h, w, 9, 8, 8), axis=3)
    f = 8.0 * flow
    # 3x3 neighborhood (zero-padded) per position: [B, H, W, 9, 2]
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = [fp[:, dy:dy + h, dx:dx + w] for dy in range(3)
              for dx in range(3)]
    nb = jnp.stack(shifts, axis=3)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, nb)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


def _refine(params, pyramid, shape, hidden, inp, num_iters):
    b, h, w = shape
    attn = _attention(params["att"], inp)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, h, w, 2))

    def step(carry, _):
        hidden, flow = carry
        flow = jax.lax.stop_gradient(flow)  # `coords1.detach()`
        corr = _corr_lookup(pyramid, shape, coords0 + flow)
        hidden, mask, dflow = _update_block(
            params["update"], hidden, inp, corr, flow, attn)
        return (hidden, flow + dflow), mask

    (hidden, flow), masks = jax.lax.scan(
        step, (hidden, jnp.zeros_like(coords0)), None, length=num_iters)
    return flow, masks[-1]


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def gma_flow(params: Params, img1: jax.Array, img2: jax.Array,
             num_iters: int = 12) -> jax.Array:
    """RAFT protocol (`network.py:78-170`): [B,3,H,W] images in [0,255]
    → flow [B,2,H,W] at full resolution (learned convex ×8 upsampling)."""
    x1 = (2.0 * (img1 / 255.0) - 1.0).transpose(0, 2, 3, 1)
    x2 = (2.0 * (img2 / 255.0) - 1.0).transpose(0, 2, 3, 1)
    f1 = _encoder(params["fnet"], x1, "instance")
    f2 = _encoder(params["fnet"], x2, "instance")
    ctx = _encoder(params["cnet"], x1, "batch")
    hidden, inp = jnp.split(ctx, [HDIM], axis=-1)
    hidden = jnp.tanh(hidden)
    inp = jax.nn.relu(inp)
    pyramid, shape = _corr_pyramid(f1, f2)
    flow, mask = _refine(params, pyramid, shape, hidden, inp, num_iters)
    up = _upsample_flow_convex(flow, mask)
    return up.transpose(0, 3, 1, 2)


def est_flow_from_feats(
    params: Params,
    fmap1: jax.Array,  # [B, C, N] (e.g. UNet q features)
    fmap2: jax.Array,
    h: int,
    w: int,
    num_iters: int = 12,
    corr_normalized_by_sqrt_dim: bool = False,
) -> jax.Array:
    """Latent-feature flow (`network.py#est_flow_from_feats:174-264`):
    correlation on the RAW features (parameter-free), zero hidden/context
    state, pretrained update block refinement, convex ×8 upsampling
    resized back to (h, w) and rescaled. fmap1→fmap2 flow [B, 2, h, w].
    The reference's training call passes corr_normalized_by_sqrt_dim=False
    (`ldm/util.py:2295-2297`)."""
    b, c, _ = fmap1.shape
    x1 = fmap1.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    x2 = fmap2.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    pyramid, shape = _corr_pyramid(x1, x2, corr_normalized_by_sqrt_dim)
    hidden = jnp.zeros((b, h, w, HDIM), x1.dtype)
    inp = jnp.zeros((b, h, w, CDIM), x1.dtype)
    flow, mask = _refine(params, pyramid, shape, hidden, inp, num_iters)
    up = _upsample_flow_convex(flow, mask)
    # resize back to feature resolution, rescaling the offsets
    # (`network.py:265-269`, align_corners=False bilinear / scale 8;
    # torch does not antialias the downsample)
    from adaface_tpu.ops.resize import resize_bilinear_half_pixel

    up = resize_bilinear_half_pixel(up, (h, w), spatial_axes=(1, 2)) / 8.0
    return up.transpose(0, 3, 1, 2)


def make_latent_flow_fn(gma_params: Params, num_iters: int = 12,
                        kernel_center_weight: float = 2.0):
    """Flow estimator over UNet latent q features for the elastic-matching
    loss (`reconstruct_feat_with_matching_flow`, `ldm/util.py:2284-2306`):
    est_flow_from_feats → 3x3 smoothing → small-motion zeroing. Returns
    flow_fn(target_q [B,C,N], src_q [B,C,N], h, w, small_motion_thres)
    → target→src flow [B,2,h,w]."""

    def flow_fn(tgt_q, src_q, h, w, small_motion_thres=0.0):
        flow = est_flow_from_feats(gma_params, tgt_q, src_q, h, w,
                                   num_iters=num_iters)
        return smooth_flow(flow, kernel_center_weight,
                           ignore_thres=small_motion_thres)

    return flow_fn


# ---------------------------------------------------------------------------
# weight conversion (models/gma-sintel.pth → these params)
# ---------------------------------------------------------------------------


def convert_gma_state_dict(sd: Mapping[str, Any]) -> Params:
    """Torch GMA checkpoint (`gma-sintel.pth`, loaded frozen at
    `ddpm.py:652-660`) → init_gma_params layout. Instance norms carry no
    weights; batch norms fold running stats; the unused relative-pos-emb
    weights are dropped (content-only attention)."""
    import numpy as np

    sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}

    def conv(name, bias=True):
        p = {"w": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            p["b"] = sd[f"{name}.bias"]
        return p

    def bnorm(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"],
                "mean": sd[f"{name}.running_mean"],
                "var": sd[f"{name}.running_var"]}

    def encoder(prefix, kind):
        def norm(name):
            return bnorm(name) if kind == "batch" else {}

        def block(name, stride):
            p = {"conv1": conv(f"{name}.conv1"), "conv2": conv(f"{name}.conv2"),
                 "n1": norm(f"{name}.norm1"), "n2": norm(f"{name}.norm2")}
            if stride != 1:
                p["down"] = conv(f"{name}.downsample.0")
                p["n3"] = norm(f"{name}.downsample.1")
            return p

        return {
            "conv1": conv(f"{prefix}.conv1"),
            "n1": norm(f"{prefix}.norm1"),
            "layer1": [block(f"{prefix}.layer1.0", 1),
                       block(f"{prefix}.layer1.1", 1)],
            "layer2": [block(f"{prefix}.layer2.0", 2),
                       block(f"{prefix}.layer2.1", 1)],
            "layer3": [block(f"{prefix}.layer3.0", 2),
                       block(f"{prefix}.layer3.1", 1)],
            "conv2": conv(f"{prefix}.conv2"),
        }

    u = "update_block"
    return {
        "fnet": encoder("fnet", "instance"),
        "cnet": encoder("cnet", "batch"),
        "att": {"to_qk": conv("att.to_qk", bias=False)},
        "update": {
            "menc": {k: conv(f"{u}.encoder.{k}") for k in
                     ("convc1", "convc2", "convf1", "convf2", "conv")},
            "agg": {"to_v": conv(f"{u}.aggregator.to_v", bias=False),
                    "gamma": sd[f"{u}.aggregator.gamma"].reshape(1)},
            "gru": {k: conv(f"{u}.gru.conv{k[0]}{k[1]}") for k in
                    ("z1", "r1", "q1", "z2", "r2", "q2")},
            "flow_head": {"conv1": conv(f"{u}.flow_head.conv1"),
                          "conv2": conv(f"{u}.flow_head.conv2")},
            "mask": {"conv1": conv(f"{u}.mask.0"),
                     "conv2": conv(f"{u}.mask.2")},
        },
    }


# ---------------------------------------------------------------------------
# warping utilities (`ldm/util.py` flow helpers)
# ---------------------------------------------------------------------------


def backward_warp_by_flow(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear backward warp: out(x) = image(x + flow(x)).

    image [B, C, H, W]; flow [B, 2, H, W] (dx, dy)."""
    b, c, h, w = image.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x = jnp.clip(gx[None] + flow[:, 0], 0, w - 1)
    y = jnp.clip(gy[None] + flow[:, 1], 0, h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]

    img_flat = image.reshape(b, c, h * w)

    def take(yi, xi):
        idx = (yi * w + xi).reshape(b, 1, h * w)
        return jnp.take_along_axis(
            img_flat, jnp.broadcast_to(idx, (b, c, h * w)), axis=-1
        ).reshape(b, c, h, w)

    out = (take(y0, x0) * (1 - wx) * (1 - wy)
           + take(y0, x1) * wx * (1 - wy)
           + take(y1, x0) * (1 - wx) * wy
           + take(y1, x1) * wx * wy)
    return out


def flow2attn(s2c_flow: jax.Array, h: int, w: int) -> jax.Array:
    """Flow → sparse attention matrix (`flow2attn`, `ldm/util.py:2257-2267`):
    backward-warp a diagonal attention by the single→comp flow, giving an
    attn from comp tokens (dim 1) to single tokens (dim 2). [B, N, N],
    column-normalized like the softmax matching attns."""
    b = s2c_flow.shape[0]
    n = h * w
    eye = jnp.broadcast_to(jnp.eye(n, dtype=s2c_flow.dtype).reshape(
        1, n, h, w), (b, n, h, w))
    warped = backward_warp_by_flow(eye, s2c_flow)
    return warped.reshape(b, n, n)


def smooth_flow(flow: jax.Array, kernel_center_weight: float = 2.0,
                ignore_thres: float = 0.0) -> jax.Array:
    """3x3 weighted smoothing + small-motion zeroing
    (`smooth_tensor_34d` + threshold, `ldm/util.py:2300-2306`)."""
    k = jnp.ones((3, 3), jnp.float32)
    k = k.at[1, 1].set(kernel_center_weight)
    k = (k / k.sum()).reshape(3, 3, 1, 1)
    b, c, h, w = flow.shape
    x = flow.reshape(b * c, h, w, 1)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = y.reshape(b, c, h, w)
    if ignore_thres > 0:
        out = jnp.where(jnp.abs(out) < ignore_thres, 0.0, out)
    return out


def flow_to_image(flow: "np.ndarray") -> "np.ndarray":
    """Middlebury color-wheel flow visualization (`gma/utils/flow_viz.py`).

    flow [H,W,2] float → uint8 [H,W,3]. Host-side numpy (visualization
    only — never on the compute path).
    """
    import numpy as np

    # build the standard 55-color wheel (RY/YG/GC/CB/BM/MR sectors)
    sectors = [(15, (255, 0, 0), (255, 255, 0)), (6, (255, 255, 0), (0, 255, 0)),
               (4, (0, 255, 0), (0, 255, 255)), (11, (0, 255, 255), (0, 0, 255)),
               (13, (0, 0, 255), (255, 0, 255)), (6, (255, 0, 255), (255, 0, 0))]
    wheel = []
    for n, c0, c1 in sectors:
        for i in range(n):
            t = i / n
            wheel.append([c0[j] * (1 - t) + c1[j] * t for j in range(3)])
    wheel = np.asarray(wheel, np.float32)  # [55,3]
    ncols = len(wheel)

    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u * u + v * v)
    rad_max = max(rad.max(), 1e-5)
    u, v, rad = u / rad_max, v / rad_max, rad / rad_max
    a = np.arctan2(-v, -u) / np.pi  # [-1,1]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col = wheel[k0] * (1 - f) + wheel[k1] * f  # [H,W,3] in 0..255
    col = col / 255.0
    # saturate toward white for small motion
    col = 1 - rad[..., None] * (1 - col)
    return (col * 255).astype(np.uint8)
