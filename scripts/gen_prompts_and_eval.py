"""Multi-subject evaluation orchestrator
(`scripts/gen_prompts_and_eval.py` equivalent).

Iterates subject folders, runs txt2img_eval per subject, and aggregates
the per-subject CSVs into a summary:

    python scripts/gen_prompts_and_eval.py --subjects_root subjects/ \
        --prompt_set dreambench --out_root eval_out --scores_csv all.csv

With neither --subjects_root nor --subject_file, falls back to the
bundled reference fixtures (the 22-subject celebrity set +
`info-subjects-celebrity.sh` table) when present. `--list_only` prints
the resolved subjects and writes the scores-CSV skeleton without running
generation — a fixture smoke path.
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

# Bundled reference eval fixtures (22 celebrity + 18 ood + 3 cartoon
# subjects with fg masks, SURVEY §2.6). The table's data_folder is
# relative to the fixture root.
REFERENCE_FIXTURE_ROOT = "/root/reference"
REFERENCE_SUBJECT_FILES = {
    "celebrity": "evaluation/info-subjects-celebrity.sh",
    "ood": "evaluation/info-subjects-ood.sh",
}


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
    ap.add_argument("--fixture_set", default="celebrity",
                    choices=sorted(REFERENCE_SUBJECT_FILES),
                    help="which bundled fixture table to use when falling "
                         "back to the reference fixtures")
    ap.add_argument("--list_only", action="store_true",
                    help="resolve subjects + write the scores-CSV skeleton "
                         "without running generation")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from adaface_tpu.evaluation.eval_utils import (
        parse_range_str, parse_subject_file)

    fixture_root = None
    if args.subject_file is None and args.subjects_root is None:
        cand = os.path.join(REFERENCE_FIXTURE_ROOT,
                            REFERENCE_SUBJECT_FILES[args.fixture_set])
        if os.path.exists(cand):
            args.subject_file = cand
            fixture_root = REFERENCE_FIXTURE_ROOT
            print(f"using bundled fixtures: {cand}")

    subj_types: dict[str, str] = {}
    if args.subject_file:
        subj_info, subj2attr = parse_subject_file(args.subject_file)
        subjects = subj_info["subjects"]
        subj_types = subj2attr.get("subj_types", {})
        if args.subjects_root is None:
            args.subjects_root = subj_info.get("data_folder", ["."])[0]
            if fixture_root is not None:
                args.subjects_root = os.path.join(fixture_root,
                                                  args.subjects_root)
    elif args.subjects_root:
        subjects = sorted(
            d for d in os.listdir(args.subjects_root)
            if os.path.isdir(os.path.join(args.subjects_root, d)))
    else:
        ap.error("one of --subjects_root / --subject_file is required")
    sel = parse_range_str(args.subject_range)
    if sel is not None:
        subjects = [subjects[i] for i in sel if i < len(subjects)]

    if args.list_only:
        missing = [n for n in subjects if not
                   os.path.isdir(os.path.join(args.subjects_root, n))]
        for name in subjects:
            n_imgs = 0
            d = os.path.join(args.subjects_root, name)
            if os.path.isdir(d):
                n_imgs = sum(1 for f in os.listdir(d)
                             if f.lower().endswith((".jpg", ".jpeg", ".png"))
                             and "_mask" not in f)
            print(f"{name}\t{subj_types.get(name, '?')}\t{n_imgs} images")
        if not os.path.exists(args.scores_csv):
            with open(args.scores_csv, "w", newline="") as f:
                csv.writer(f).writerow(
                    ["subject", "prompt_set", "clip_text", "clip_img",
                     "dino", "face_sim", "n_images"])
        assert not missing, f"missing subject folders: {missing}"
        print(f"{len(subjects)} subjects resolved under "
              f"{args.subjects_root}; skeleton at {args.scores_csv}")
        return

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
