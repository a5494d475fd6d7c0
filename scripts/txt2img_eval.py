"""Evaluation generator + scorer (`scripts/stable_txt2img.py` equivalent).

Generates samples for a prompt set with a subject's ada embeddings, then
optionally computes face-sim / CLIP-T / CLIP-I / DINO scores against the
reference images and appends a CSV row:

    python scripts/txt2img_eval.py --subject subjects/alice \
        --prompt_set dreambench --out_dir eval_out/alice \
        --calc_face_sim --compare_with subjects/alice \
        --scores_csv scores.csv
"""

from __future__ import annotations

import argparse
import os

import jax

from _common import add_model_args, build_wrapper, load_subject_images, save_images


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--subject", required=True)
    ap.add_argument("--subject_name", default=None)
    ap.add_argument("--class_token", default="person",
                    help="class word substituted into prompts for CLIP-T "
                         "text scoring (the reference scores against the "
                         "class prompt, e.g. 'man'/'woman')")
    ap.add_argument("--prompt_set", default="dreambench",
                    choices=["dreambench", "community", "all"])
    ap.add_argument("--prompt_range", default=None,
                    help="e.g. '0-4,7' to select prompts")
    ap.add_argument("--n_samples", type=int, default=4, help="per prompt")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", default="eval_out")
    ap.add_argument("--calc_face_sim", action="store_true")
    ap.add_argument("--compare_with", default=None,
                    help="ground-truth folder for CLIP-I/DINO/face-sim")
    ap.add_argument("--scores_csv", default=None)
    # dual guidance scale interpolation (eval protocol: 4 → 1)
    ap.add_argument("--guidance_scale_min", type=float, default=None)
    ap.add_argument("--config", default=None,
                    help="inference YAML (configs/inference.yaml) supplying "
                         "scheduler/steps/guidance defaults")
    args = ap.parse_args()

    if args.config:
        import yaml

        with open(args.config) as f:
            icfg = yaml.safe_load(f) or {}
        pipe_cfg = icfg.get("pipeline", {})
        for yaml_key, attr in (("num_inference_steps", "num_inference_steps"),
                               ("guidance_scale", "guidance_scale"),
                               ("guidance_scale_min", "guidance_scale_min"),
                               ("image_size", "size")):
            if pipe_cfg.get(yaml_key) is not None:
                setattr(args, attr, pipe_cfg[yaml_key])
        if icfg.get("model", {}).get("id2ada_encoder"):
            args.encoder = icfg["model"]["id2ada_encoder"]

    from adaface_tpu.evaluation.eval_utils import append_score_row, parse_range_str
    from adaface_tpu.evaluation.prompt_sets import PROMPT_SETS

    wrapper = build_wrapper(args, "text2img")
    subject_images = load_subject_images(args.subject)
    ada = wrapper.prepare_adaface_embeddings(images=subject_images)
    if ada is None:
        raise SystemExit("no face detected in subject images")

    prompts = PROMPT_SETS[args.prompt_set]
    sel = parse_range_str(args.prompt_range)
    if sel is not None:
        prompts = [prompts[i] for i in sel]

    subj_name = args.subject_name or os.path.basename(
        os.path.normpath(args.subject))
    placeholder = wrapper.update_prompt("")
    all_dirs = []
    for pi, tmpl in enumerate(prompts):
        prompt = tmpl.format(placeholder)
        out = wrapper.forward(
            prompt, num_images=args.n_samples,
            rng=jax.random.PRNGKey(args.seed + pi),
            height=args.size, width=args.size, update_prompt=False,
            num_inference_steps=args.num_inference_steps)
        d = os.path.join(args.out_dir, f"p{pi:02d}")
        save_images(out, d)
        all_dirs.append((d, tmpl.format(args.class_token)))
        print(f"[{pi + 1}/{len(prompts)}] {prompt!r}")

    if args.compare_with or args.calc_face_sim:
        from adaface_tpu.evaluation.clip_eval import CLIPEvaluator
        from adaface_tpu.evaluation.dino_eval import DINOEvaluator
        from adaface_tpu.evaluation.eval_utils import (
            compare_face_folders, compare_folders)

        clip_ev = CLIPEvaluator()
        dino_ev = DINOEvaluator()
        for d, prompt_text in all_dirs:
            scores = {"subject": subj_name, "prompt": prompt_text, "dir": d}
            if args.compare_with:
                scores.update(compare_folders(
                    d, args.compare_with, prompt=prompt_text,
                    clip_evaluator=clip_ev, dino_evaluator=dino_ev))
            if args.calc_face_sim:
                gt = args.compare_with or args.subject
                scores.update(compare_face_folders(d, gt))
            if args.scores_csv:
                append_score_row(args.scores_csv, scores)
            print(scores)


if __name__ == "__main__":
    main()
