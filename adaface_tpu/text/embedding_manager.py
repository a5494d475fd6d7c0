"""Ada-embedding splicing into prompts — explicit dataflow.

Rebuild of `ldm/modules/embedding_manager.py` (EmbeddingManager) without the
four-level forward monkey-patching: all token-position logic runs host-side
on numpy token ids and produces static index maps; the embedding math
(splice / merge / distribute) runs in-graph as differentiable gathers and
scatter-adds, so ada-embedding gradients flow to the SubjBasisGenerator.

Semantics mirrored:
- placeholder + filler walk: prompts carry `"z" + ", " * (K-1)`
  (`ldm/data/personalized.py:549-555`); vector k goes to the k-th
  placeholder-or-comma position after the first occurrence, skipping gap
  tokens (`embedding_manager.py:378-410`).
- prompt masks: emb mask excludes BOS and EOS/pad (`:423-430`).
- cls-delta merging: in class prompts without the placeholder, multi-token
  class-delta strings are summed into one embedding and the tail shifted
  left (`scan_cls_delta_strings`/`merge_cls_token_embeddings`,
  `ldm/util.py:616-733`).
- distribute_embedding_to_M_tokens: copy the merged class embedding onto
  the M aligned filler positions (`ldm/util.py:550-614`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.text.tokenizer import CLIPTokenizer


# ---------------------------------------------------------------------------
# host-side index planning (numpy)
# ---------------------------------------------------------------------------


def build_splice_map(
    ids: np.ndarray,  # [B, S]
    placeholder_id: int,
    filler_id: int,
    num_vectors: int,
) -> np.ndarray:
    """[B, S] int32: position → ada-vector index k in [0, K), or -1.

    Walks from the first placeholder occurrence per row, assigning vector k
    to the k-th position whose token is the placeholder or the filler,
    skipping any gap tokens.
    """
    b, s = ids.shape
    out = np.full((b, s), -1, np.int32)
    for bi in range(b):
        pos = np.where(ids[bi] == placeholder_id)[0]
        if len(pos) == 0:
            continue
        p = int(pos[0])
        k = 0
        while k < num_vectors and p < s:
            if ids[bi, p] == placeholder_id or ids[bi, p] == filler_id:
                out[bi, p] = k
                k += 1
            p += 1
    return out


def prompt_masks(ids: np.ndarray, bos_id: int, eos_id: int):
    """(emb_mask [B,S,1], pad_mask [B,S,1]) per `update_prompt_masks`."""
    emb = (ids != bos_id) & (ids != eos_id)
    # pad tokens: eos occurrences after the first one
    is_eos = ids == eos_id
    first_eos = np.argmax(is_eos, axis=1)
    pad = is_eos.copy()
    rows = np.arange(ids.shape[0])
    pad[rows, first_eos] = False
    return emb[..., None].astype(np.float32), pad[..., None].astype(np.float32)


def scan_cls_delta_spans(
    ids: np.ndarray,
    subj_rows_pos: list[tuple[int, int]],  # (row_with_placeholder, start_pos)
    cls_delta_tokens: dict[str, list[int]],
    max_search_span: int = 5,
) -> list[tuple[int, int, int, str]]:
    """Find class-delta token runs in rows *without* the placeholder.

    Returns (batch_i, start, M, subj_name) tuples. Mirrors
    `scan_cls_delta_strings` (`ldm/util.py:616-680`): class rows are the
    second half of the batch, aligned with the subject rows' start
    positions.
    """
    b = ids.shape[0]
    half = len(subj_rows_pos)
    found = []
    for i, (subj_row, start_pos) in enumerate(subj_rows_pos):
        batch_i = half + i
        if batch_i >= b:
            break
        row = ids[batch_i]
        done = False
        for j in range(max_search_span + 1):
            start = start_pos + j
            for name, toks in cls_delta_tokens.items():
                m = len(toks)
                if start + m <= len(row) and np.array_equal(
                    row[start:start + m], np.asarray(toks)
                ):
                    found.append((batch_i, start, m, name))
                    done = True
                    break
            if done:
                break
    return found


def build_merge_map(
    b: int, s: int, spans: list[tuple[int, int, int, str]]
) -> np.ndarray:
    """[B, S, 2] int32 merge plan for merge_cls_token_embeddings
    (`ldm/util.py:683-737`), built by replaying the reference's sequential
    writes exactly:

    - `[..., 0]` is a dest→source gather map: position `start - i_off` of
      each span is followed by the tail `start+M:` shifted left by
      `i_off + M - 1`; the last `off_total` positions keep their original
      (identity) sources, matching the untouched tail of the reference.
    - `[..., 1]` is a source→dest map marking span members: the M source
      positions of a span map to its merged slot (their embeddings are
      summed there); all other positions are -1.
    """
    gather_src = np.tile(np.arange(s, dtype=np.int32), (b, 1))
    span_dest = np.full((b, s), -1, np.int32)
    by_row: dict[int, list[tuple[int, int]]] = {}
    for batch_i, start, m, _ in sorted(spans, key=lambda x: (x[0], x[1])):
        by_row.setdefault(batch_i, []).append((start, m))
    for bi, row_spans in by_row.items():
        off = 0
        for start, m in row_spans:
            span_dest[bi, start:start + m] = start - off
            if off + m - 1 > 0:
                lo = start - off + 1
                hi = s - (off + m - 1)
                gather_src[bi, lo:hi] = np.arange(start + m, s, dtype=np.int32)
            off += m - 1
    return np.stack([gather_src, span_dest], axis=-1)


# ---------------------------------------------------------------------------
# in-graph ops (jnp, differentiable)
# ---------------------------------------------------------------------------


def splice_ada_embeddings(
    base_embs: jax.Array,  # [B, S, D]
    ada_embs: jax.Array,  # [B, K, D]
    splice_map: jax.Array,  # [B, S] int32 (-1 = keep base)
) -> jax.Array:
    gathered = jnp.take_along_axis(
        ada_embs, jnp.clip(splice_map, 0)[..., None], axis=1
    )  # [B, S, D]
    return jnp.where((splice_map >= 0)[..., None], gathered.astype(base_embs.dtype),
                     base_embs)


def apply_merge_map(embs: jax.Array, merge_map: jax.Array) -> jax.Array:
    """Differentiable replay of merge_cls_token_embeddings: gather the
    shifted layout, then overwrite each span's merged slot with the sum of
    its member embeddings (all reads from the ORIGINAL embeddings, as in
    the reference)."""
    b, s, d = embs.shape
    gather_src = merge_map[..., 0]
    span_dest = merge_map[..., 1]
    out = jnp.take_along_axis(embs, gather_src[..., None], axis=1)
    member = (span_dest >= 0).astype(embs.dtype)[..., None]
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
    dest = jnp.clip(span_dest, 0)
    sums = jnp.zeros_like(embs).at[bidx, dest].add(embs * member)
    n_members = jnp.zeros((b, s), embs.dtype).at[bidx, dest].add(member[..., 0])
    return jnp.where((n_members > 0)[..., None], sums, out)


def distribute_embedding_to_M_tokens(
    embs: jax.Array,  # [B, S, D]
    splice_map: jax.Array,  # [B, S] (k index or -1) marking the M positions
    uncond_embs: jax.Array | None = None,  # [1 or B, S, D]
    divide_scheme: str = "sqrt_M",
    emb_cfg: float = 2.0,
    emb_extra_boost: float = 2.0,
) -> jax.Array:
    """Distribute each row's k=0 embedding onto all M marked positions
    (`distribute_embedding_to_M_tokens`, `ldm/util.py:550-597`): the
    written value is compel-style embedding CFG against the uncond
    embedding at the same position (cls·cfg − uncond·(cfg−1)), boosted by
    emb_extra_boost and divided by √M (or M / 1 per divide_scheme)."""
    is_first = splice_map == 0
    # per-row first embedding: gather position of k=0
    first_pos = jnp.argmax(is_first, axis=1)  # [B]
    bidx = jnp.arange(embs.shape[0])
    first_emb = embs[bidx, first_pos].astype(jnp.float32)  # [B, D]
    if uncond_embs is not None and emb_cfg != 1.0:
        u = jnp.broadcast_to(uncond_embs, embs.shape)[bidx, first_pos]
        first_emb = first_emb * emb_cfg - u.astype(jnp.float32) * (emb_cfg - 1.0)
    m = (splice_map >= 0).sum(axis=1).astype(jnp.float32)  # [B]
    if divide_scheme == "sqrt_M":
        div = jnp.sqrt(jnp.maximum(m, 1.0))
    elif divide_scheme == "M":
        div = jnp.maximum(m, 1.0)
    else:
        div = jnp.ones_like(m)
    first_emb = first_emb * (emb_extra_boost / div)[:, None]
    has_first = jnp.any(is_first, axis=1)[:, None, None]
    # the reference skips rows with M == 1 (`:560-562`)
    marked = (splice_map >= 0)[..., None] & has_first & (m > 1.0)[:, None, None]
    return jnp.where(marked, first_emb[:, None, :].astype(embs.dtype), embs)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PlaceholderSpec:
    string: str  # e.g. "z"
    num_vectors: int  # K (16 for arc2face, 4 for consistentID, 20 joint)


class EmbeddingManager:
    """Host-side planner: tokenize prompts, build splice/merge maps, and
    produce the kwargs for `clip.text_encode(input_embs=…)`."""

    def __init__(
        self,
        tokenizer: CLIPTokenizer,
        placeholders: list[PlaceholderSpec],
        filler_string: str = ",",
        cls_delta_tokens: dict[str, list[int]] | None = None,
        max_search_span: int = 5,
    ):
        self.tokenizer = tokenizer
        self.placeholders = placeholders
        self.placeholder_ids = {
            p.string: tokenizer.add_tokens([p.string])[0] for p in placeholders
        }
        self.filler_id = tokenizer.encode_text(filler_string)[0]
        self.cls_delta_tokens = cls_delta_tokens or {}
        self.max_search_span = max_search_span

    def expand_placeholder(self, spec: PlaceholderSpec) -> str:
        """'z' → 'z, , , …' with K-1 fillers (`personalized.py:553-555`)."""
        return spec.string + ", " * (spec.num_vectors - 1)

    def plan(self, prompts: list[str], max_length: int = 77):
        """→ dict with ids [B,S], per-placeholder splice maps, masks, and
        cls-delta merge map."""
        ids = self.tokenizer(prompts, max_length=max_length)
        splice_maps = {}
        subj_rows_pos: list[tuple[int, int]] = []
        for spec in self.placeholders:
            pid = self.placeholder_ids[spec.string]
            smap = build_splice_map(ids, pid, self.filler_id, spec.num_vectors)
            splice_maps[spec.string] = smap
            for bi in range(ids.shape[0]):
                pos = np.where(smap[bi] == 0)[0]
                if len(pos):
                    subj_rows_pos.append((bi, int(pos[0])))
        emb_mask, pad_mask = prompt_masks(
            ids, self.tokenizer.bos_token_id, self.tokenizer.eos_token_id
        )
        merge_map = None
        if self.cls_delta_tokens and subj_rows_pos:
            have_placeholder = {r for r, _ in subj_rows_pos}
            if len(have_placeholder) < ids.shape[0]:
                spans = scan_cls_delta_spans(
                    ids, sorted(subj_rows_pos), self.cls_delta_tokens,
                    self.max_search_span,
                )
                if spans:
                    merge_map = build_merge_map(*ids.shape, spans)
        return {
            "ids": ids,
            "splice_maps": splice_maps,
            "prompt_emb_mask": emb_mask,
            "prompt_pad_mask": pad_mask,
            "merge_map": merge_map,
        }

    def embed(
        self,
        token_embedding_table: jax.Array,  # [V, D] (extended past base vocab)
        plan: dict,
        ada_embs: dict[str, jax.Array],  # placeholder string → [B, K, D]
    ) -> jax.Array:
        """→ input embeddings [B, S, D] ready for text_encode(input_embs=…)."""
        ids = jnp.asarray(plan["ids"])
        base = token_embedding_table[ids]
        for name, smap in plan["splice_maps"].items():
            if name in ada_embs:
                base = splice_ada_embeddings(base, ada_embs[name], jnp.asarray(smap))
        if plan["merge_map"] is not None:
            base = apply_merge_map(base, jnp.asarray(plan["merge_map"]))
        return base


def extend_token_embedding(
    token_embedding: jax.Array, n_new: int, init_from: jax.Array | None = None
) -> jax.Array:
    """Extend the embedding table for added placeholder tokens
    (`extend_nn_embedding`, `adaface/util.py:77-94`)."""
    if init_from is None:
        init_from = token_embedding.mean(axis=0, keepdims=True).repeat(n_new, 0)
    return jnp.concatenate([token_embedding, init_from], axis=0)
