"""ToMe token-merging unit tests (ops/tome.py).

Covers the static dst/src partition (one dst per sx-by-sy cell, seeded
pseudo-random in-cell offset per ToMe-SD use_rand=True), the merge /
unmerge round-trip, and that merging identical tokens is lossless.
"""

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.tome import ToMeConfig, _partition, build_merge


def test_partition_one_dst_per_cell_random_offsets():
    h = w = 16
    for seed in (None, 0, 7):
        dst_idx, src_idx, inv = _partition(h, w, 2, 2, seed)
        assert dst_idx.shape[0] == (h // 2) * (w // 2)
        assert dst_idx.shape[0] + src_idx.shape[0] == h * w
        # every token appears exactly once across dst ++ src
        assert np.array_equal(
            np.sort(np.concatenate([np.asarray(dst_idx), np.asarray(src_idx)])),
            np.arange(h * w))
        # one dst per cell
        ys, xs = np.asarray(dst_idx) // w, np.asarray(dst_idx) % w
        cells = set(zip(ys // 2, xs // 2))
        assert len(cells) == dst_idx.shape[0]
    # seeded grid differs from the top-left grid (the artifact fix)
    d_rand = np.asarray(_partition(h, w, 2, 2, 0)[0])
    d_grid = np.asarray(_partition(h, w, 2, 2, None)[0])
    assert not np.array_equal(d_rand, d_grid)
    # deterministic per seed
    assert np.array_equal(d_rand, np.asarray(_partition(h, w, 2, 2, 0)[0]))


def test_merge_unmerge_roundtrip_shapes_and_constant_exactness():
    h = w = 8
    b, c = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h * w, c))
    r = h * w // 2
    merge, unmerge, n_kept = build_merge(x, h, w, r, 2, 2, rand_seed=3)
    y = merge(x)
    assert y.shape == (b, h * w - r, c)
    assert n_kept == h * w - r
    z = unmerge(y)
    assert z.shape == x.shape
    # constant token field is exactly preserved through merge+unmerge
    ones = jnp.ones((b, h * w, c))
    np.testing.assert_allclose(np.asarray(unmerge(merge(ones))), 1.0,
                               atol=1e-6)


def test_config_defaults_match_tome_sd():
    cfg = ToMeConfig()
    assert cfg.merge_mlp is False and cfg.merge_crossattn is False
    assert cfg.rand_seed is not None
    assert hash(cfg)  # frozen/hashable — used as part of the jit cache key
