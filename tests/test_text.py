import jax.numpy as jnp
import numpy as np

from adaface_tpu.text.embedding_manager import (
    EmbeddingManager,
    PlaceholderSpec,
    apply_merge_map,
    build_merge_map,
    build_splice_map,
    distribute_embedding_to_M_tokens,
    prompt_masks,
    scan_cls_delta_spans,
    splice_ada_embeddings,
)
from adaface_tpu.text.tokenizer import CLIPTokenizer


def tok():
    return CLIPTokenizer.character_fallback()


def test_tokenizer_basics():
    t = tok()
    ids = t(["a photo of a cat"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == t.bos_token_id
    eos_pos = np.argmax(ids[0] == t.eos_token_id)
    assert eos_pos > 1
    # padded with eos so argmax-of-ids pooling finds the first eos
    assert (ids[0, eos_pos:] == t.eos_token_id).all()
    # roundtrip
    assert t.decode(ids[0]) == "a photo of a cat"


def test_tokenizer_added_tokens():
    t = tok()
    (zid,) = t.add_tokens(["z"])
    assert zid == t.base_vocab_size
    ids = t(["a photo of z smiling"])[0]
    assert zid in ids
    # deterministic across instances
    t2 = tok()
    t2.add_tokens(["z"])
    np.testing.assert_array_equal(ids, t2(["a photo of z smiling"])[0])


def test_tokenizer_real_bpe_merges():
    """A tiny real vocab with merges exercises the BPE loop."""
    vocab = {}
    for ch in "abcdefgh":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["ab"] = len(vocab)
    vocab["ab</w>"] = len(vocab)
    vocab["abc</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    t = CLIPTokenizer(vocab, merges=[("a", "b"), ("ab", "c</w>")])
    ids = t.encode_text("abc")
    assert ids == [vocab["abc</w>"]]
    ids = t.encode_text("abd")
    assert ids == [vocab["ab"], vocab["d</w>"]]


def test_splice_map_with_fillers_and_gap():
    t = tok()
    (zid,) = t.add_tokens(["z"])
    em = EmbeddingManager(t, [PlaceholderSpec("z", 4)])
    prompt = "a photo of " + em.expand_placeholder(em.placeholders[0]) + " dancing"
    ids = t([prompt])
    smap = build_splice_map(ids, zid, em.filler_id, 4)
    ks = smap[0][smap[0] >= 0]
    np.testing.assert_array_equal(ks, [0, 1, 2, 3])
    # the k=0 position holds the placeholder token itself
    assert ids[0][np.argmax(smap[0] == 0)] == zid


def test_splice_embeddings_differentiable():
    import jax

    b, s, k, d = 2, 10, 3, 4
    base = jnp.zeros((b, s, d))
    smap = np.full((b, s), -1, np.int32)
    smap[:, 2:5] = [0, 1, 2]
    ada = jnp.ones((b, k, d))

    def loss(ada):
        out = splice_ada_embeddings(base, ada, jnp.asarray(smap))
        return out.sum()

    g = jax.grad(loss)(ada)
    # every ada vector is used exactly once per row
    np.testing.assert_allclose(np.asarray(g), np.ones((b, k, d)))


def test_prompt_masks():
    t = tok()
    ids = t(["hi there"])
    emb, pad = prompt_masks(ids, t.bos_token_id, t.eos_token_id)
    assert emb.shape == (1, 77, 1)
    assert emb[0, 0, 0] == 0  # bos excluded
    eos_pos = int(np.argmax(ids[0] == t.eos_token_id))
    assert pad[0, eos_pos, 0] == 0  # first eos is not padding
    assert pad[0, eos_pos + 1, 0] == 1


def test_cls_delta_scan_and_merge():
    # batch: row0 has the placeholder at pos 3; row1 is the class prompt
    # with a 3-token class string at the aligned position
    s = 12
    ids = np.zeros((2, s), np.int64)
    ids[0, 3] = 500  # placeholder
    ids[1, 3:6] = [7, 8, 9]  # cls delta tokens
    ids[1, 6:] = np.arange(100, 100 + s - 6)
    spans = scan_cls_delta_spans(ids, [(0, 3)], {"alice": [7, 8, 9]})
    assert spans == [(1, 3, 3, "alice")]

    dest = build_merge_map(2, s, spans)
    embs = jnp.asarray(np.arange(2 * s * 2, dtype=np.float32).reshape(2, s, 2))
    out = apply_merge_map(embs, jnp.asarray(dest))
    # row0 untouched
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(embs[0]))
    # row1: position 3 = sum of 3,4,5; positions 4.. shifted left by 2
    np.testing.assert_allclose(
        np.asarray(out[1, 3]), np.asarray(embs[1, 3] + embs[1, 4] + embs[1, 5])
    )
    np.testing.assert_allclose(np.asarray(out[1, 4]), np.asarray(embs[1, 6]))


def test_distribute_embedding():
    """Reference semantics (`distribute_embedding_to_M_tokens`,
    `ldm/util.py:550-597`): value written = (cls·cfg − uncond·(cfg−1))
    · boost / √M at every marked position."""
    rs = np.random.RandomState(0)
    embs = jnp.asarray(rs.randn(1, 8, 4).astype(np.float32))
    uncond = jnp.asarray(rs.randn(1, 8, 4).astype(np.float32))
    smap = np.full((1, 8), -1, np.int32)
    smap[0, 2:5] = [0, 1, 2]
    out = distribute_embedding_to_M_tokens(embs, jnp.asarray(smap), uncond)
    want = (np.asarray(embs[0, 2]) * 2.0 - np.asarray(uncond[0, 2])) \
        * 2.0 / np.sqrt(3.0)
    for pos in (2, 3, 4):
        np.testing.assert_allclose(np.asarray(out[0, pos]), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(embs[0, 1]))
    # no uncond / cfg disabled → plain boosted copy
    out2 = distribute_embedding_to_M_tokens(
        embs, jnp.asarray(smap), None, emb_cfg=1.0, emb_extra_boost=1.0,
        divide_scheme="none")
    np.testing.assert_allclose(np.asarray(out2[0, 4]), np.asarray(embs[0, 2]))
    # M == 1 rows are left untouched (`:560-562`)
    smap1 = np.full((1, 8), -1, np.int32)
    smap1[0, 3] = 0
    out3 = distribute_embedding_to_M_tokens(embs, jnp.asarray(smap1), uncond)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(embs))


def test_embedding_manager_end_to_end():
    t = tok()
    em = EmbeddingManager(t, [PlaceholderSpec("z", 4)])
    spec = em.placeholders[0]
    prompts = [
        "a photo of " + em.expand_placeholder(spec) + " at the beach",
        "a photo of person at the beach",
    ]
    plan = em.plan(prompts)
    d = 8
    table = jnp.asarray(
        np.random.RandomState(0).randn(t.vocab_size, d).astype(np.float32)
    )
    ada = {"z": jnp.ones((2, 4, d)) * 5.0}
    out = em.embed(table, plan, ada)
    assert out.shape == (2, 77, d)
    smap = plan["splice_maps"]["z"]
    # spliced positions of row0 hold the ada values
    np.testing.assert_allclose(np.asarray(out[0][smap[0] >= 0]), 5.0)
    # row1 (no placeholder) untouched
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(table[jnp.asarray(plan["ids"][1])])
    )
