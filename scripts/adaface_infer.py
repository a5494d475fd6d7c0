"""Text→image inference CLI (`adaface/adaface_infer.py` equivalent).

    python scripts/adaface_infer.py --subject path/to/subject_folder \
        --prompt "portrait at the beach" --out_dir out/ [--num_images 4]
"""

from __future__ import annotations

import argparse

import jax

from _common import (
    add_model_args,
    build_wrapper,
    load_subject_images,
    save_image_grid,
    save_images,
)


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--subject", required=True,
                    help="folder (or single image) of the subject")
    ap.add_argument("--prompt", default="portrait photo, high quality")
    ap.add_argument("--negative_prompt",
                    default="flaws in the eyes, flaws in the face, lowres, "
                            "non-HDRi, low quality")
    ap.add_argument("--num_images", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", default="out")
    ap.add_argument("--grid", action="store_true", default=True)
    args = ap.parse_args()

    wrapper = build_wrapper(args, "text2img")
    images = load_subject_images(args.subject)
    print(f"{len(images)} subject images")
    ada = wrapper.prepare_adaface_embeddings(images=images)
    if ada is None:
        raise SystemExit("no face detected in the subject images")

    out = wrapper.forward(
        args.prompt, negative_prompt=args.negative_prompt,
        num_images=args.num_images, rng=jax.random.PRNGKey(args.seed),
        height=args.size, width=args.size)
    paths = save_images(out, args.out_dir)
    if args.grid:
        grid = save_image_grid(out, f"{args.out_dir}/grid.png")
        print(f"wrote {grid}")
    print(f"wrote {len(paths)} images to {args.out_dir}")


if __name__ == "__main__":
    main()
