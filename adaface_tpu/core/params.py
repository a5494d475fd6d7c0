"""Parameter-pytree helpers.

Every model in adaface_tpu is a pair of pure functions:

    init(rng, cfg) -> params        # nested dict of jnp arrays
    apply(params, *inputs, cfg=...) -> outputs

Params live as plain nested dicts so that checkpoint conversion from torch
state-dicts is a direct key-mapping exercise, weight surgery (MKV attention
extension, position-embedding extension, embedding-table splicing) is ordinary
dict/array manipulation, and pjit sharding rules can be expressed as pytree
path patterns.

Compute dtype policy: params are stored fp32 (or bf16 for frozen towers);
matmuls run in bf16 on the MXU with fp32 accumulation via
``preferred_element_type``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

PyTree = Any


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Dtype policy threaded through apply() functions.

    param_dtype: storage dtype of parameters.
    compute_dtype: dtype activations/matmul inputs are cast to.
    accum_dtype: accumulation dtype for MXU matmuls and reductions.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    def cast(self, x: jax.Array) -> jax.Array:
        return x.astype(self.compute_dtype)


def default_policy() -> DTypePolicy:
    return DTypePolicy()


FP32 = DTypePolicy(compute_dtype=jnp.float32)


def normal_init(rng, shape, stddev=0.02, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype) * jnp.asarray(stddev, dtype)


def zeros_init(rng, shape, dtype=jnp.float32):
    del rng
    return jnp.zeros(shape, dtype)


def lecun_normal(rng, shape, fan_in=None, dtype=jnp.float32):
    if fan_in is None:
        fan_in = shape[0] if len(shape) <= 2 else math.prod(shape[:-1])
    std = 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.normal(rng, shape, dtype) * jnp.asarray(std, dtype)


def he_normal(rng, shape, fan_in=None, dtype=jnp.float32):
    if fan_in is None:
        fan_in = shape[0] if len(shape) <= 2 else math.prod(shape[:-1])
    std = math.sqrt(2.0 / max(fan_in, 1))
    return jax.random.normal(rng, shape, dtype) * jnp.asarray(std, dtype)


def count_params(tree: PyTree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def tree_size_bytes(tree: PyTree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def param_dtype_cast(tree: PyTree, dtype) -> PyTree:
    """Cast all floating-point leaves to `dtype` (ints untouched)."""

    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def split_rngs(rng: jax.Array, names: list[str]) -> dict[str, jax.Array]:
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))


def tree_paths(tree: PyTree) -> list[str]:
    """Flat list of '/'-joined key paths, for sharding-rule matching."""
    paths = []
    for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        paths.append("/".join(parts))
    return paths


def map_with_path(fn: Callable[[str, jax.Array], jax.Array], tree: PyTree) -> PyTree:
    """tree_map where fn also receives the '/'-joined key path."""

    def wrap(path, leaf):
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return fn("/".join(parts), leaf)

    return jax.tree_util.tree_map_with_path(wrap, tree)
