"""Evaluation harness orchestration.

Rebuild of `evaluation/eval_utils.py`: `compare_folders` (CLIP-T/CLIP-I/
DINO vs a ground-truth folder, `:70-119`), `compare_face_folders`
(`:367-443`), prompt-list formatting and range parsing (`:453-520`), and
CSV score logging (`scripts/stable_txt2img.py:174-210` protocol).
"""

from __future__ import annotations

import csv
import os
from typing import Sequence

from adaface_tpu.evaluation.face_sim import (
    compare_face_images,
    load_folder_images,
)


def parse_range_str(range_str: str | None) -> list[int] | None:
    """'1,3-5,8' → [1, 3, 4, 5, 8] (`parse_range_str:489-508`)."""
    if not range_str:
        return None
    out: list[int] = []
    for part in range_str.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return out


def parse_subject_file(path: str) -> tuple[dict, dict]:
    """Parse a fish-syntax subject table (`info-subjects-celebrity.sh`
    style; `ldm/util.py:246-288`): lines of `set -g var v1 v2 …`, where a
    single `$other` value aliases a previously-defined variable. Returns
    (subj_info, subj2attr) with subj2attr['subj_types'] mapping each
    subject to its class type (man/woman/…)."""
    import re

    subj_info: dict[str, list[str]] = {}
    with open(path) as f:
        for line in f:
            mat = re.search(r"^set -g ([a-zA-Z_]+)\s+(\S.*)", line.strip())
            if mat is None:
                continue
            values = mat.group(2).split()
            if len(values) == 1 and values[0].startswith("$"):
                values = subj_info[values[0][1:]]
            subj_info[mat.group(1)] = values

    missing = [v for v in ("subjects",) if v not in subj_info]
    if missing:
        raise ValueError(f"{path}: missing required variables {missing}")
    subj2attr: dict[str, dict[str, str]] = {}
    for var in ("subj_types", "cls_delta_strings"):
        vals = subj_info.get(var)
        if vals is None:
            continue
        if len(vals) != len(subj_info["subjects"]):
            raise ValueError(
                f"{path}: {var} has {len(vals)} values for "
                f"{len(subj_info['subjects'])} subjects")
        subj2attr[var] = dict(zip(subj_info["subjects"], vals))
    return subj_info, subj2attr


def format_prompt_list(
    placeholder: str,
    class_token: str,
    prompts: Sequence[str],
    broad_class: int = 1,
) -> tuple[list[str], list[str]]:
    """Substitute subject/class tokens into a prompt set
    (`format_prompt_list:453-487`): returns (subject_prompts, class_prompts).
    Each template uses '{}' for the subject slot."""
    subj, cls = [], []
    for p in prompts:
        subj.append(p.format(placeholder))
        cls.append(p.format(class_token))
    return subj, cls


def compare_folders(
    samples_dir: str,
    gt_dir: str,
    prompt: str | None = None,
    clip_evaluator=None,
    dino_evaluator=None,
    num_samples: int | None = None,
) -> dict:
    """CLIP-T / CLIP-I / DINO similarity of generated samples vs ground
    truth (`compare_folders:70-119`). Evaluators are injected so weights
    load once across subjects."""
    samples = load_folder_images(samples_dir, num_samples)
    gt = load_folder_images(gt_dir, num_samples)
    scores: dict = {"n_samples": len(samples), "n_gt": len(gt)}
    if clip_evaluator is not None:
        if prompt:
            scores["clip_t"] = clip_evaluator.txt_to_img_similarity(
                [prompt], samples)
        scores["clip_i"] = clip_evaluator.img_to_img_similarity(samples, gt)
    if dino_evaluator is not None:
        scores["dino"] = dino_evaluator.img_to_img_similarity(samples, gt)
    return scores


def compare_face_folders(
    samples_dir: str, gt_dir: str, backend=None, num_samples: int | None = None
) -> dict:
    """Face similarity between folders (`compare_face_folders:367-443`)."""
    samples = load_folder_images(samples_dir, num_samples)
    gt = load_folder_images(gt_dir, num_samples)
    return compare_face_images(samples, gt, backend)


def append_score_row(csv_path: str, row: dict):
    """Append one scores row (`stable_txt2img.py --scores_csv` protocol)."""
    exists = os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            writer.writeheader()
        writer.writerow(row)
