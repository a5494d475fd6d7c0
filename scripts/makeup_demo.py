"""Parsing-based virtual makeup demo (`face_parsing/makeup.py` equivalent).

    python scripts/makeup_demo.py --image face.jpg --out makeup.png \
        [--parsing parsing.png | --bisenet_ckpt 79999_iter.pth] \
        [--hair 100,200,100] [--upper_lip 230,50,20] [--lower_lip 230,50,20]

Parsing comes from a precomputed label map (`--parsing`, grayscale PNG of
part ids as in the reference's `res/test_res/{}.png`), or is generated on
the fly by the BiSeNet face parser (`models/bisenet.py`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _color(s):
    r, g, b = (int(v) for v in s.split(","))
    return (r, g, b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--parsing", default=None,
                    help="precomputed part-label PNG; else run BiSeNet")
    ap.add_argument("--bisenet_ckpt", default=None)
    ap.add_argument("--size", type=int, default=512)
    for part in ("hair", "upper_lip", "lower_lip"):
        ap.add_argument(f"--{part}", type=_color, default=None,
                        help=f"target RGB for {part}, e.g. 230,50,20")
    args = ap.parse_args()

    from PIL import Image

    from adaface_tpu.utils.makeup import apply_makeup

    img = Image.open(args.image).convert("RGB")
    img = img.resize((args.size, args.size), Image.LANCZOS)
    image = np.asarray(img)

    if args.parsing:
        parsing = np.asarray(
            Image.open(args.parsing).resize((args.size, args.size),
                                            Image.NEAREST))
    else:
        import jax

        from adaface_tpu.models.bisenet import (bisenet_forward,
                                                convert_bisenet_state_dict,
                                                init_bisenet_params)

        if args.bisenet_ckpt:
            from adaface_tpu.tools.ckpt_lib import load_state_dict

            params = convert_bisenet_state_dict(
                load_state_dict(args.bisenet_ckpt))
        else:
            params = init_bisenet_params(jax.random.PRNGKey(0))
            print("WARNING: random BiSeNet weights — demo plumbing only")
        x = (image.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        logits = bisenet_forward(params, x[None].transpose(0, 3, 1, 2))
        parsing = np.asarray(jax.numpy.argmax(logits, axis=1)[0])

    spec = {p: getattr(args, p) for p in ("hair", "upper_lip", "lower_lip")
            if getattr(args, p) is not None}
    if not spec:
        spec = {"hair": (100, 200, 100)}  # reference default demo color
    out = apply_makeup(image, parsing, spec)
    Image.fromarray(out).save(args.out)
    print(f"wrote {args.out} (parts: {list(spec)})")


if __name__ == "__main__":
    main()
