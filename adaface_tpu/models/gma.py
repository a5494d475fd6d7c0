"""GMA/RAFT-style optical flow, functional JAX.

Rebuild of `gma/` (network.py / extractor.py / corr.py / update.py /
gma.py): feature encoder → all-pairs correlation pyramid → iterative
ConvGRU refinement with global-motion-aggregation attention. The live use
in the reference is latent-feature flow for the elastic-matching loss
(`est_flow_from_feats`, called from `reconstruct_feat_with_matching_flow`,
`ldm/util.py:2284-2312`; enabled by `--use_face_flow_for_sc_matching_loss`,
default off) — so the same two entry points are provided:

- `est_flow_from_feats(params, fmap1, fmap2, h, w, num_iters)` — flow from
  arbitrary [B, C, N] feature maps (projected to the encoder dim).
- `gma_flow(params, img1, img2)` — image-level flow (RAFT protocol).

Plus the warping utilities the loss library needs:
`backward_warp_by_flow`, `smooth_flow`.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

FDIM = 128  # correlation feature dim
HDIM = 96  # GRU hidden dim
CDIM = 64  # context dim
CORR_LEVELS = 4
CORR_RADIUS = 3


def _conv_init(rng, kh, kw, cin, cout):
    std = math.sqrt(2.0 / (kh * kw * cin))
    return {"w": jax.random.normal(rng, (kh, kw, cin, cout)) * std,
            "b": jnp.zeros((cout,))}


def _conv(p, x, stride=1, padding=None):
    k = p["w"].shape[0]
    padding = padding if padding is not None else k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def init_gma_params(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 32))
    return {
        # feature/context encoders (compact BasicEncoder: 3 conv stages)
        "fnet": {
            "conv1": _conv_init(next(ks), 7, 7, 3, 64),
            "conv2": _conv_init(next(ks), 3, 3, 64, 96),
            "conv3": _conv_init(next(ks), 3, 3, 96, FDIM),
        },
        "cnet": {
            "conv1": _conv_init(next(ks), 7, 7, 3, 64),
            "conv2": _conv_init(next(ks), 3, 3, 64, 96),
            "conv3": _conv_init(next(ks), 3, 3, 96, HDIM + CDIM),
        },
        # projection for latent-feature flow (arbitrary C → FDIM)
        "feat_proj": None,  # built lazily per channel count
        # motion encoder
        "menc": {
            "corr1": _conv_init(next(ks), 1, 1,
                                CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2, 96),
            "corr2": _conv_init(next(ks), 3, 3, 96, 64),
            "flow1": _conv_init(next(ks), 7, 7, 2, 64),
            "flow2": _conv_init(next(ks), 3, 3, 64, 32),
            "out": _conv_init(next(ks), 3, 3, 96, 126),
        },
        # GMA attention (aggregate motion features by context similarity)
        "gma": {
            "to_q": _conv_init(next(ks), 1, 1, CDIM, 64),
            "to_k": _conv_init(next(ks), 1, 1, CDIM, 64),
            "gamma": jnp.zeros(()),
        },
        # ConvGRU
        "gru": {
            # hidden (HDIM) + context inp (CDIM) + aggregated motion (128)
            "z": _conv_init(next(ks), 3, 3, HDIM + CDIM + 128, HDIM),
            "r": _conv_init(next(ks), 3, 3, HDIM + CDIM + 128, HDIM),
            "q": _conv_init(next(ks), 3, 3, HDIM + CDIM + 128, HDIM),
        },
        "flow_head": {
            "conv1": _conv_init(next(ks), 3, 3, HDIM, 128),
            "conv2": _conv_init(next(ks), 3, 3, 128, 2),
        },
    }


def _encoder(p, x):
    h = jax.nn.relu(_conv(p["conv1"], x, stride=2))
    h = jax.nn.relu(_conv(p["conv2"], h, stride=2))
    return _conv(p["conv3"], h, stride=2)


def _corr_pyramid(f1, f2):
    """All-pairs correlation → CORR_LEVELS pooled volumes.

    f1, f2: [B, H, W, C] → list of [B, H, W, H/2^l, W/2^l]."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bijc,bklc->bijkl", f1, f2,
                      preferred_element_type=jnp.float32) / math.sqrt(c)
    pyramid = [corr]
    cur = corr.reshape(b * h * w, h, w, 1)
    for _ in range(CORR_LEVELS - 1):
        cur = jax.lax.reduce_window(
            cur, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        ch, cw = cur.shape[1:3]
        pyramid.append(cur.reshape(b, h, w, ch, cw))
    return pyramid


def _lookup(pyramid, coords):
    """Sample correlation in a (2r+1)² window at each level.

    coords: [B, H, W, 2] (x, y) in level-0 units → [B, H, W, L*(2r+1)²]."""
    b, h, w, _ = coords.shape
    r = CORR_RADIUS
    outs = []
    dgrid = jnp.stack(jnp.meshgrid(
        jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0),
        indexing="xy"), axis=-1).reshape(-1, 2)  # [(2r+1)², 2]
    for lvl, corr in enumerate(pyramid):
        ch, cw = corr.shape[3:5]
        c = coords / (2 ** lvl)
        # sample points [B,H,W,K,2]
        pts = c[:, :, :, None, :] + dgrid[None, None, None]
        x = jnp.clip(pts[..., 0], 0, cw - 1)
        y = jnp.clip(pts[..., 1], 0, ch - 1)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, cw - 1)
        y1 = jnp.minimum(y0 + 1, ch - 1)
        wx = x - x0
        wy = y - y0

        cflat = corr.reshape(b, h, w, ch * cw)

        def take(yi, xi):
            idx = yi * cw + xi  # [B,H,W,K]
            return jnp.take_along_axis(cflat, idx, axis=-1)

        v = (take(y0, x0) * (1 - wx) * (1 - wy)
             + take(y0, x1) * wx * (1 - wy)
             + take(y1, x0) * (1 - wx) * wy
             + take(y1, x1) * wx * wy)
        outs.append(v)
    return jnp.concatenate(outs, axis=-1)


def _gma_aggregate(p, context, motion):
    """Global motion aggregation: attention over context similarity."""
    b, h, w, _ = context.shape
    q = _conv(p["to_q"], context).reshape(b, h * w, -1)
    k = _conv(p["to_k"], context).reshape(b, h * w, -1)
    attn = jax.nn.softmax(
        jnp.einsum("bnc,bmc->bnm", q, k) / math.sqrt(q.shape[-1]), axis=-1)
    m = motion.reshape(b, h * w, -1)
    agg = jnp.einsum("bnm,bmc->bnc", attn, m).reshape(b, h, w, -1)
    return motion + p["gamma"] * agg


def _refine(params, pyramid, context_h, context_c, num_iters):
    b, h, w, _ = context_h.shape
    coords0 = jnp.stack(jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32),
        indexing="xy"), axis=-1)[None].repeat(b, 0)
    flow = jnp.zeros((b, h, w, 2), jnp.float32)
    hidden = jnp.tanh(context_h)
    inp = jax.nn.relu(context_c)

    def step(carry, _):
        hidden, flow = carry
        corr = _lookup(pyramid, coords0 + flow)
        mc = jax.nn.relu(_conv(params["menc"]["corr1"], corr))
        mc = jax.nn.relu(_conv(params["menc"]["corr2"], mc))
        mf = jax.nn.relu(_conv(params["menc"]["flow1"], flow))
        mf = jax.nn.relu(_conv(params["menc"]["flow2"], mf))
        motion = jax.nn.relu(
            _conv(params["menc"]["out"], jnp.concatenate([mc, mf], -1)))
        motion = jnp.concatenate([motion, flow], -1)  # 128 ch
        motion = _gma_aggregate(params["gma"], inp, motion)

        hx = jnp.concatenate([hidden, inp, motion], axis=-1)
        z = jax.nn.sigmoid(_conv(params["gru"]["z"], hx))
        r = jax.nn.sigmoid(_conv(params["gru"]["r"], hx))
        qx = jnp.concatenate([r * hidden, inp, motion], axis=-1)
        q = jnp.tanh(_conv(params["gru"]["q"], qx))
        hidden = (1 - z) * hidden + z * q
        dflow = _conv(params["flow_head"]["conv2"],
                      jax.nn.relu(_conv(params["flow_head"]["conv1"], hidden)))
        return (hidden, flow + dflow), None

    (hidden, flow), _ = jax.lax.scan(step, (hidden, flow), None,
                                     length=num_iters)
    return flow


def gma_flow(params: Params, img1: jax.Array, img2: jax.Array,
             num_iters: int = 12) -> jax.Array:
    """RAFT protocol: [B,3,H,W] images in [-1,1] → flow [B,2,H,W]
    (upsampled from 1/8 resolution)."""
    from adaface_tpu.ops.resize import resize_nearest

    x1 = img1.transpose(0, 2, 3, 1)
    x2 = img2.transpose(0, 2, 3, 1)
    f1 = _encoder(params["fnet"], x1)
    f2 = _encoder(params["fnet"], x2)
    ctx = _encoder(params["cnet"], x1)
    ch, cc = jnp.split(ctx, [HDIM], axis=-1)
    pyramid = _corr_pyramid(f1, f2)
    flow = _refine(params, pyramid, ch, cc, num_iters)
    h, w = img1.shape[2:]
    up = resize_nearest(flow, (h, w), spatial_axes=(1, 2)) * (h / flow.shape[1])
    return up.transpose(0, 3, 1, 2)


def make_feat_proj(rng: jax.Array, c_in: int) -> Params:
    return {"proj": _conv_init(rng, 1, 1, c_in, FDIM),
            "ctx": _conv_init(jax.random.fold_in(rng, 1), 1, 1, c_in,
                              HDIM + CDIM)}


def est_flow_from_feats(
    params: Params,
    proj: Params,
    fmap1: jax.Array,  # [B, C, N] (e.g. UNet q features)
    fmap2: jax.Array,
    h: int,
    w: int,
    num_iters: int = 12,
) -> jax.Array:
    """Latent-feature flow (`gma/network.py#est_flow_from_feats`):
    fmap1→fmap2 flow [B, 2, h, w]."""
    b, c, _ = fmap1.shape
    x1 = fmap1.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    x2 = fmap2.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    f1 = _conv(proj["proj"], x1, padding=0)
    f2 = _conv(proj["proj"], x2, padding=0)
    ctx = _conv(proj["ctx"], x1, padding=0)
    ch, cc = jnp.split(ctx, [HDIM], axis=-1)
    pyramid = _corr_pyramid(f1, f2)
    flow = _refine(params, pyramid, ch, cc, num_iters)
    return flow.transpose(0, 3, 1, 2)


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


def make_latent_flow_fn(gma_params: Params, feat_proj: Params,
                        num_iters: int = 12,
                        kernel_center_weight: float = 2.0):
    """Flow estimator over UNet latent q features for the elastic-matching
    loss (`reconstruct_feat_with_matching_flow`, `ldm/util.py:2284-2306`):
    est_flow_from_feats → 3x3 smoothing → small-motion zeroing. Returns
    flow_fn(target_q [B,C,N], src_q [B,C,N], h, w, small_motion_thres)
    → target→src flow [B,2,h,w]."""

    def flow_fn(tgt_q, src_q, h, w, small_motion_thres=0.0):
        flow = est_flow_from_feats(gma_params, feat_proj, tgt_q, src_q,
                                   h, w, num_iters=num_iters)
        return smooth_flow(flow, kernel_center_weight,
                           ignore_thres=small_motion_thres)

    return flow_fn


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
