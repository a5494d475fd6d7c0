"""Generate `*_mask.png` face masks for training data
(`scripts-private/gen_face_masks.py` / `face_parsing/gen_masks.py`
equivalent).

    python scripts/gen_face_masks.py --in_dir subjects/alice \
        [--bisenet_ckpt 79999_iter.pth] [--min_face_frac 0.01] [--trash_dir t/]

Quality filters mirror the reference: images whose parsed face area is too
small (no clear full face) are moved to --trash_dir instead of masked.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--bisenet_ckpt", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--min_face_frac", type=float, default=0.01)
    ap.add_argument("--trash_dir", default=None)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    from PIL import Image

    from adaface_tpu.models.bisenet import (
        bisenet_forward, convert_bisenet_state_dict, init_bisenet_params,
        parsing_to_face_mask)

    if args.bisenet_ckpt:
        from adaface_tpu.tools.ckpt_lib import load_state_dict

        params = convert_bisenet_state_dict(load_state_dict(args.bisenet_ckpt))
        print(f"loaded BiSeNet weights from {args.bisenet_ckpt}")
    else:
        params = init_bisenet_params(jax.random.PRNGKey(0))
        print("WARNING: random BiSeNet weights — masks are only for "
              "pipeline smoke tests")

    fwd = jax.jit(lambda p, x: bisenet_forward(p, x))
    exts = {".jpg", ".jpeg", ".png", ".webp"}
    files = sorted(f for f in os.listdir(args.in_dir)
                   if os.path.splitext(f)[1].lower() in exts
                   and not f.endswith("_mask.png"))
    kept = trashed = 0
    for fn in files:
        stem = os.path.splitext(fn)[0]
        out_path = os.path.join(args.in_dir, stem + "_mask.png")
        if os.path.exists(out_path) and not args.overwrite:
            continue
        img = Image.open(os.path.join(args.in_dir, fn)).convert("RGB")
        orig_size = img.size
        arr = np.asarray(img.resize((args.size, args.size))).astype(np.float32)
        arr = ((arr / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).transpose(2, 0, 1)
        logits = fwd(params, arr[None])
        parsing = np.asarray(logits[0].argmax(axis=0))
        mask = parsing_to_face_mask(parsing)
        face_frac = (mask > 0).mean()
        if face_frac < args.min_face_frac:
            trashed += 1
            if args.trash_dir:
                os.makedirs(args.trash_dir, exist_ok=True)
                shutil.move(os.path.join(args.in_dir, fn),
                            os.path.join(args.trash_dir, fn))
                print(f"{fn}: face area {face_frac:.3f} < "
                      f"{args.min_face_frac} → trashed")
            else:
                print(f"{fn}: face area {face_frac:.3f} too small — skipped")
            continue
        Image.fromarray(mask).resize(orig_size, Image.NEAREST).save(out_path)
        kept += 1
    print(f"masks written: {kept}; filtered: {trashed}")


if __name__ == "__main__":
    main()
