"""Multi-subject evaluation orchestrator
(`scripts/gen_prompts_and_eval.py` equivalent).

Iterates subject folders, runs txt2img_eval per subject, and aggregates
the per-subject CSVs into a summary:

    python scripts/gen_prompts_and_eval.py --subjects_root subjects/ \
        --prompt_set dreambench --out_root eval_out --scores_csv all.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects_root", default=None)
    ap.add_argument("--subject_file", default=None,
                    help="fish-syntax subject table (info-subjects-*.sh "
                         "style): supplies subjects, subj_types, and "
                         "data_folder when --subjects_root is omitted")
    ap.add_argument("--subject_range", default=None, help="e.g. '0-5'")
    ap.add_argument("--prompt_set", default="dreambench")
    ap.add_argument("--out_root", default="eval_out")
    ap.add_argument("--scores_csv", default="scores.csv")
    ap.add_argument("--n_samples", type=int, default=4)
    ap.add_argument("--num_inference_steps", type=int, default=50)
    ap.add_argument("--extra_args", nargs="*", default=[])
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from adaface_tpu.evaluation.eval_utils import (
        parse_range_str, parse_subject_file)

    subj_types: dict[str, str] = {}
    if args.subject_file:
        subj_info, subj2attr = parse_subject_file(args.subject_file)
        subjects = subj_info["subjects"]
        subj_types = subj2attr.get("subj_types", {})
        if args.subjects_root is None:
            args.subjects_root = subj_info.get("data_folder", ["."])[0]
    elif args.subjects_root:
        subjects = sorted(
            d for d in os.listdir(args.subjects_root)
            if os.path.isdir(os.path.join(args.subjects_root, d)))
    else:
        ap.error("one of --subjects_root / --subject_file is required")
    sel = parse_range_str(args.subject_range)
    if sel is not None:
        subjects = [subjects[i] for i in sel if i < len(subjects)]

    for name in subjects:
        subj_dir = os.path.join(args.subjects_root, name)
        out_dir = os.path.join(args.out_root, name)
        cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                            "txt2img_eval.py"),
               "--subject", subj_dir, "--subject_name", name,
               "--prompt_set", args.prompt_set, "--out_dir", out_dir,
               "--n_samples", str(args.n_samples),
               "--num_inference_steps", str(args.num_inference_steps),
               "--calc_face_sim", "--compare_with", subj_dir,
               "--scores_csv", args.scores_csv] + args.extra_args
        if name in subj_types:
            cmd += ["--class_token", subj_types[name]]
        print(f"=== {name} ===", flush=True)
        subprocess.run(cmd, check=True)

    # aggregate
    if os.path.exists(args.scores_csv):
        with open(args.scores_csv) as f:
            rows = list(csv.DictReader(f))
        nums = {}
        for row in rows:
            for k, v in row.items():
                try:
                    nums.setdefault(k, []).append(float(v))
                except (TypeError, ValueError):
                    pass
        print("=== averages ===")
        for k, vals in nums.items():
            print(f"{k}: {sum(vals) / len(vals):.4f} (n={len(vals)})")


if __name__ == "__main__":
    main()
