"""Token merging (ToMe) for the SD UNet's spatial transformer blocks.

Opt-in sampling accelerator alongside deepcache/int8 (no reference
counterpart — the reference's serving path is plain diffusers,
`adaface/adaface_wrapper.py:730-807`). Neighboring latent tokens are
highly redundant; merging the most-similar ones before self-attention
shrinks the dominant S=4096 level-0 attention + (optionally) the GEGLU
FFN, which the perf envelope shows is where the UNet's time goes.

Method (Bolya & Hoffman, "Token Merging for Fast Stable Diffusion",
arXiv:2303.17604 — see PAPERS.md): bipartite soft matching between a
strided destination grid (one token per sx×sy cell) and the remaining
source tokens; the r source tokens most similar to any destination are
averaged into their match before the op and copied back from it after
("unmerge"). Merge decisions are recomputed per block from the block's
input tokens.

TPU-first: every shape is static (r, the dst/src partition, and the
inverse permutation are compile-time constants; only the *values* of the
match indices are data-dependent), so the whole thing jits into gathers,
one [Nsrc,Ndst] similarity matmul on the MXU, a top-r argsort, and two
batched scatters — no recompiles across steps.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ToMeConfig:
    """ratio: fraction of ALL tokens merged away (0.5 → 4096→2048 tokens).
    min_tokens: apply only in blocks with at least this many spatial
    tokens (4096 = SD1.5 level 0 only; 1024 adds level 1).
    merge_crossattn / merge_mlp: also run cross-attn queries / the GEGLU
    FFN on the merged token set (both default off to match ToMe-SD; the
    FFN merge is cheap extra speed at slightly more drift).
    rand_seed: seeds the per-cell pseudo-random dst choice (ToMe-SD
    use_rand=True; the paper reports a fixed top-left grid causes visible
    regular artifacts at ratio 0.5). Offsets are static per (h, w, sx,
    sy, seed) so all shapes stay compile-time constant; None restores the
    deterministic top-left grid."""

    ratio: float = 0.5
    min_tokens: int = 4096
    sx: int = 2
    sy: int = 2
    merge_crossattn: bool = False
    merge_mlp: bool = False
    rand_seed: int | None = 0


@functools.lru_cache(maxsize=None)
def _partition(h: int, w: int, sx: int, sy: int, rand_seed: int | None = 0):
    """Static dst/src token split on the row-major (h, w) grid plus the
    inverse permutation mapping concat([dst, src]) back to token order.
    One dst token per sx×sy cell, at a seeded pseudo-random in-cell
    offset (rand_seed=None → top-left)."""
    hh, ww = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    if rand_seed is None:
        is_dst = ((hh % sy == 0) & (ww % sx == 0)).reshape(-1)
    else:
        rs = np.random.RandomState(rand_seed)
        n_cy = (h + sy - 1) // sy
        n_cx = (w + sx - 1) // sx
        dy = rs.randint(0, sy, size=(n_cy, n_cx))
        dx = rs.randint(0, sx, size=(n_cy, n_cx))
        cy, cx = hh // sy, ww // sx
        # clip in-cell offsets at the ragged right/bottom edges
        ty = np.minimum(cy * sy + dy[cy, cx], h - 1)
        tx = np.minimum(cx * sx + dx[cy, cx], w - 1)
        is_dst = ((hh == ty) & (ww == tx)).reshape(-1)
    dst_idx = np.nonzero(is_dst)[0]
    src_idx = np.nonzero(~is_dst)[0]
    inv = np.empty(h * w, np.int32)
    inv[dst_idx] = np.arange(len(dst_idx))
    inv[src_idx] = len(dst_idx) + np.arange(len(src_idx))
    # NOTE: cache NUMPY arrays — jnp.asarray inside a trace yields
    # constant tracers, and caching those leaks them into later traces
    # (UnexpectedTracerError on the second compile; caught on-chip)
    return (dst_idx.astype(np.int32), src_idx.astype(np.int32), inv)


def build_merge(x: jax.Array, h: int, w: int, r: int, sx: int = 2,
                sy: int = 2, rand_seed: int | None = 0):
    """→ (merge, unmerge, n_merged): token-set reducer/expander pair.

    x [B, N, C] (N = h·w) provides the cosine-similarity metric; merge /
    unmerge then apply to any [B, N, C'] tensor (the per-op inputs).
    merge: [B, N, C'] → [B, N - r, C'] (layout [dst ‖ kept src]).
    unmerge: [B, N - r, C'] → [B, N, C'] (merged src copied from their
    destination's output).
    """
    b, n, _ = x.shape
    assert n == h * w, (n, h, w)
    dst_idx, src_idx, inv = _partition(h, w, sx, sy, rand_seed)
    n_dst = dst_idx.shape[0]
    n_src = src_idx.shape[0]
    r = max(0, min(int(r), n_src))

    metric = x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                  keepdims=True) + 1e-6).astype(x.dtype)
    scores = jnp.einsum(
        "bsc,bdc->bsd", jnp.take(metric, src_idx, axis=1),
        jnp.take(metric, dst_idx, axis=1),
        preferred_element_type=jnp.float32)  # [B, Nsrc, Ndst]
    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B, Nsrc]

    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)
    merged_pos = order[:, :r]  # positions into the src list
    kept_pos = order[:, r:]
    tgt = jnp.take_along_axis(node_idx, merged_pos, axis=1)  # [B, r]
    brow = jnp.arange(b, dtype=jnp.int32)[:, None]

    # per-dst merge counts (static cost: one scatter-add of ones)
    cnt = jnp.zeros((b, n_dst), jnp.float32).at[brow, tgt].add(
        1.0, mode="drop")

    def merge(tokens: jax.Array) -> jax.Array:
        xd = jnp.take(tokens, dst_idx, axis=1)
        xs = jnp.take(tokens, src_idx, axis=1)
        xs_m = jnp.take_along_axis(xs, merged_pos[..., None], axis=1)
        acc = jnp.zeros(xd.shape, jnp.float32).at[brow, tgt].add(
            xs_m.astype(jnp.float32), mode="drop")
        xd = ((xd.astype(jnp.float32) + acc)
              / (1.0 + cnt)[..., None]).astype(tokens.dtype)
        xk = jnp.take_along_axis(xs, kept_pos[..., None], axis=1)
        return jnp.concatenate([xd, xk], axis=1)

    def unmerge(y: jax.Array) -> jax.Array:
        yd = y[:, :n_dst]
        yk = y[:, n_dst:]
        src_out = jnp.zeros((b, n_src, y.shape[-1]), y.dtype)
        src_out = src_out.at[brow, kept_pos].set(yk, mode="drop")
        y_m = jnp.take_along_axis(yd, tgt[..., None], axis=1)
        src_out = src_out.at[brow, merged_pos].set(y_m, mode="drop")
        full = jnp.concatenate([yd, src_out], axis=1)
        return jnp.take(full, inv, axis=1)

    return merge, unmerge, n - r
