"""Device meshes and sharding rules.

The reference's only parallelism is 2-GPU DDP over NCCL (SURVEY §2.8). The
TPU-native equivalent is SPMD over a `jax.sharding.Mesh`:

- axis 'dp': data parallel — batches sharded, params replicated, XLA inserts
  the psum for gradient reduction at the jit boundary (this subsumes DDP).
- axis 'tp': tensor parallel — attention-head/MLP sharding for the large
  towers via param-pattern rules (`shard_params`), for scaling beyond what
  replication allows on a slice.

Shardings ride ICI within a slice; multi-slice runs put 'dp' on DCN
(outermost mesh axis) per the standard scaling recipe.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adaface_tpu.core.params import map_with_path

PyTree = Any


def make_mesh(dp: int | None = None, tp: int = 1,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp; replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(batch: PyTree, mesh: Mesh) -> PyTree:
    """Shard each leaf's leading axis over 'dp'; leaves whose dim 0 is not
    divisible by dp (scalars, per-iteration vectors like the 3-element
    clip_skip_weights) are replicated instead.

    Step-major leaves (teacher chains / phase-A outputs shaped
    [S, B, ...] under the `teacher_*` / `recon_phase_a` keys) shard
    axis 1 — the batch axis — so a step count that happens to divide dp
    never gets split across devices."""
    sh = batch_sharding(mesh)
    sh1 = NamedSharding(mesh, P(None, "dp"))
    rep = replicated(mesh)
    dp = mesh.shape["dp"]

    def place_leading(x):
        shaped = getattr(x, "shape", None)
        ok = shaped is not None and len(shaped) >= 1 and shaped[0] % dp == 0
        return jax.device_put(x, sh if ok else rep)

    def place_step_major(x):
        shaped = getattr(x, "shape", None)
        ok = shaped is not None and len(shaped) >= 2 and shaped[1] % dp == 0
        return jax.device_put(x, sh1 if ok else rep)

    if isinstance(batch, dict):
        out = {}
        for k, v in batch.items():
            if k == "recon_phase_a" and isinstance(v, dict):
                out[k] = {k2: (place_step_major(x)
                               if k2.startswith("eps_") else place_leading(x))
                          for k2, x in v.items()}
                continue
            # Only the genuinely step-major [S, B, ...] teacher chains;
            # the single-step `teacher_noise_pred` ([B,4,H,W]) must shard
            # its leading batch axis, not the 4-channel axis.
            step_major = k in ("teacher_x_ts", "teacher_ts",
                               "teacher_noise_preds")
            out[k] = jax.tree_util.tree_map(
                place_step_major if step_major else place_leading, v)
        return out
    return jax.tree_util.tree_map(place_leading, batch)


# Default tensor-parallel rules: shard the out-features of QKV/MLP-in
# projections and the in-features of output projections over 'tp'.
DEFAULT_TP_RULES: list[tuple[str, P]] = [
    (r".*attn.*/(q|k|v)/w$", P(None, "tp")),
    (r".*attn.*/o/w$", P("tp", None)),
    (r".*mlp/fc1/w$", P(None, "tp")),
    (r".*mlp/fc2/w$", P("tp", None)),
    (r".*ff/proj_in/w$", P(None, "tp")),
    (r".*ff/proj_out/w$", P("tp", None)),
]


def shard_params(
    params: PyTree,
    mesh: Mesh,
    rules: list[tuple[str, P]] | None = None,
) -> PyTree:
    """device_put each param according to the first matching path rule;
    unmatched params are replicated."""
    rules = DEFAULT_TP_RULES if rules is None else rules
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def place(path: str, leaf):
        for pat, spec in compiled:
            if pat.match(path):
                # only shard if divisible
                axes = [a for a in spec if a is not None]
                ok = True
                for dim, name in zip(leaf.shape, spec):
                    if name is not None and dim % mesh.shape[name] != 0:
                        ok = False
                if ok and axes:
                    return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, replicated(mesh))

    return map_with_path(place, params)
