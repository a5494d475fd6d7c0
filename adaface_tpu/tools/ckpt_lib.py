"""Checkpoint surgery library.

Rebuild of the reference's checkpoint-manipulation toolbox
(`scripts/ckpt_lib.py`, `repl_vae.py`, `repl_textencoder.py`,
`avg_models.py`, `extract_unet.py`, `ckpt_fp32to16.py`, `modeldiff.py`,
`chk_ckpt_weights.py`, `repl_by_pat.py`): flat state-dict operations over
.safetensors / .npz / torch .ckpt files. All ops are torch-free numpy
except `load_state_dict` on .ckpt/.pt (host torch CPU).
"""

from __future__ import annotations

import fnmatch
import os
import re
from typing import Mapping

import numpy as np

StateDict = dict[str, np.ndarray]


def flatten_tree(tree, prefix: str = "") -> StateDict:
    """Nested params pytree → flat dot-keyed state dict (numpy)."""
    flat: StateDict = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            flat.update(flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten_tree(v, f"{prefix}{i}."))
    elif tree is not None:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def unflatten_tree(flat: Mapping[str, np.ndarray]) -> dict:
    """Flat dot-keyed state dict → nested dict pytree (inverse of
    flatten_tree up to list/tuple nodes, which come back as int-keyed
    dicts — jax tree ops treat those the same)."""
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------------------------------------------------------------------
# io
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> StateDict:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(path))
    if ext == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if ext in (".ckpt", ".pt", ".pth", ".bin"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()}
    raise ValueError(f"unsupported checkpoint format: {path}")


def save_state_dict(sd: Mapping[str, np.ndarray], path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".safetensors":
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    elif ext == ".npz":
        np.savez(path, **sd)
    else:
        raise ValueError(f"unsupported save format: {path} (use "
                         ".safetensors or .npz)")


# ---------------------------------------------------------------------------
# surgeries
# ---------------------------------------------------------------------------


def replace_subtree(base: StateDict, donor: StateDict, prefix: str,
                    donor_prefix: str | None = None) -> StateDict:
    """Replace every `prefix*` key in base with the donor's values
    (`repl_vae.py`/`repl_textencoder.py`: swap `first_stage_model.` /
    `cond_stage_model.` subtrees inside an SD checkpoint)."""
    donor_prefix = donor_prefix if donor_prefix is not None else prefix
    out = dict(base)
    replaced = 0
    for k in list(out.keys()):
        if not k.startswith(prefix):
            continue
        dk = donor_prefix + k[len(prefix):]
        if dk in donor:
            out[k] = donor[dk]
            replaced += 1
    if replaced == 0:
        raise KeyError(f"no keys under '{prefix}' matched the donor")
    return out


def extract_subtree(sd: StateDict, prefix: str, strip: bool = True) -> StateDict:
    """`extract_unet.py`: pull `model.diffusion_model.*` (or any prefix)."""
    out = {k[len(prefix):] if strip else k: v
           for k, v in sd.items() if k.startswith(prefix)}
    if not out:
        raise KeyError(f"no keys under '{prefix}'")
    return out


def average_state_dicts(sds: list[StateDict],
                        weights: list[float] | None = None) -> StateDict:
    """`avg_models.py`: weighted average of checkpoints."""
    weights = weights or [1.0 / len(sds)] * len(sds)
    assert len(weights) == len(sds)
    keys = set(sds[0])
    for sd in sds[1:]:
        keys &= set(sd)
    out: StateDict = {}
    for k in keys:
        if not np.issubdtype(sds[0][k].dtype, np.floating):
            out[k] = sds[0][k]
            continue
        acc = np.zeros_like(sds[0][k], np.float64)
        for w, sd in zip(weights, sds):
            acc += w * sd[k].astype(np.float64)
        out[k] = acc.astype(sds[0][k].dtype)
    return out


def cast_fp16(sd: StateDict) -> StateDict:
    """`ckpt_fp32to16.py`: cast float arrays to fp16."""
    return {k: (v.astype(np.float16)
                if np.issubdtype(v.dtype, np.floating) else v)
            for k, v in sd.items()}


def model_diff(a: StateDict, b: StateDict, topk: int = 20):
    """`modeldiff.py`: per-key mean-abs differences, largest first."""
    rows = []
    for k in sorted(set(a) & set(b)):
        if a[k].shape != b[k].shape:
            rows.append((k, float("inf")))
            continue
        if np.issubdtype(a[k].dtype, np.floating):
            rows.append((k, float(np.abs(a[k].astype(np.float64)
                                         - b[k].astype(np.float64)).mean())))
    rows.sort(key=lambda r: -r[1])
    missing_a = sorted(set(b) - set(a))
    missing_b = sorted(set(a) - set(b))
    return rows[:topk], missing_a, missing_b


def check_weights(sd: StateDict) -> dict:
    """`chk_ckpt_weights.py`: NaN/Inf/zero statistics per checkpoint."""
    stats = {"n_params": 0, "n_tensors": len(sd), "nan_keys": [],
             "inf_keys": [], "zero_keys": []}
    for k, v in sd.items():
        stats["n_params"] += int(v.size)
        if not np.issubdtype(v.dtype, np.floating):
            continue
        if np.isnan(v).any():
            stats["nan_keys"].append(k)
        if np.isinf(v).any():
            stats["inf_keys"].append(k)
        if np.abs(v).max() == 0:
            stats["zero_keys"].append(k)
    return stats


def replace_by_pattern(base: StateDict, donor: StateDict,
                       patterns: list[str], use_regex: bool = False) -> StateDict:
    """`repl_by_pat.py`: replace keys matching glob/regex patterns."""
    out = dict(base)
    n = 0
    for k in out:
        matched = any(
            (re.search(p, k) if use_regex else fnmatch.fnmatch(k, p))
            for p in patterns)
        if matched and k in donor:
            out[k] = donor[k]
            n += 1
    if n == 0:
        raise KeyError(f"no keys matched {patterns}")
    return out


def clean_log_folders(root: str, pat: str, skip_pat: str | None = None,
                      keep: int = 1, del_samples: bool = False,
                      mock: bool = False) -> int:
    """Prune old periodic checkpoints under a root of training-log dirs
    (`scripts-private/clean-ckpts-and-logs.py` equivalent).

    Every `<root>/<run>/checkpoints` whose path matches `pat` (regex) and
    not `skip_pat` has all but the `keep` largest-step
    `embeddings_gs-<step>` entries removed (both Orbax checkpoint dirs and
    single-file ckpts); `del_samples` additionally removes the run's
    `samples/` folder. Returns the number of checkpoints deleted (or that
    would be, with mock=True)."""
    import shutil

    if keep < 0:
        raise ValueError(f"keep must be >= 0, got {keep}")
    step_re = re.compile(r"embeddings_gs-(\d+)(\.pt|\.ckpt|\.safetensors)?$")
    n_deleted = 0
    for run in sorted(os.listdir(root)):
        ckpt_dir = os.path.join(root, run, "checkpoints")
        if not os.path.isdir(ckpt_dir) or not re.search(pat, ckpt_dir):
            continue
        if skip_pat and re.search(skip_pat, ckpt_dir):
            print(f"skipping: {ckpt_dir}")
            continue
        entries = []
        for name in os.listdir(ckpt_dir):
            m = step_re.fullmatch(name)
            if m:
                entries.append((int(m.group(1)), name))
        entries.sort()
        for _, name in entries[:-keep] if keep > 0 else entries:
            path = os.path.join(ckpt_dir, name)
            print(f"{'would delete' if mock else 'deleting'}: {path}")
            if not mock:
                if os.path.isdir(path):
                    shutil.rmtree(path)
                else:
                    os.remove(path)
            n_deleted += 1
        for _, name in (entries[-keep:] if keep > 0 else []):
            print(f"keeping:  {os.path.join(ckpt_dir, name)}")
        if del_samples:
            samples = os.path.join(root, run, "samples")
            if os.path.isdir(samples):
                print(f"{'would delete' if mock else 'deleting'}: {samples}")
                if not mock:
                    shutil.rmtree(samples)
    return n_deleted
