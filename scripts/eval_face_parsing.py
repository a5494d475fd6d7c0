"""Face-parsing evaluation (`face_parsing/evaluate.py` equivalent).

Runs BiSeNet over a folder of face images, saves color-coded parsing
overlays (0.4 image + 0.6 annotation, like the reference's
`vis_parsing_maps`), and — beyond the reference — reports mIoU / pixel
accuracy when a CelebAMask-HQ-style labeled dataset root is given:

    python scripts/eval_face_parsing.py --in_dir faces/ --out_dir vis/ \
        [--bisenet_ckpt 79999_iter.pth]
    python scripts/eval_face_parsing.py --dataset_root celebamask/ \
        [--batches 50] [--batch_size 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", default=None, help="folder of face images")
    ap.add_argument("--out_dir", default="parsing_vis")
    ap.add_argument("--dataset_root", default=None,
                    help="images/ + labels/ root for mIoU scoring")
    ap.add_argument("--bisenet_ckpt", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", type=int, default=None,
                    help="truncate the eval pass (default: full dataset)")
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from adaface_tpu.models.bisenet import (
        bisenet_forward, convert_bisenet_state_dict, init_bisenet_params)
    from adaface_tpu.train.face_parsing_train import (
        FaceMaskDataset, evaluate_face_parsing, overlay_parsing)

    if args.bisenet_ckpt:
        from adaface_tpu.tools.ckpt_lib import load_state_dict

        params = convert_bisenet_state_dict(load_state_dict(args.bisenet_ckpt))
        print(f"loaded BiSeNet weights from {args.bisenet_ckpt}")
    else:
        params = init_bisenet_params(jax.random.PRNGKey(0))
        print("WARNING: random BiSeNet weights — overlays/metrics are only "
              "for pipeline smoke tests")

    if args.dataset_root:
        ds = FaceMaskDataset(args.dataset_root, crop_size=args.size)
        metrics = evaluate_face_parsing(
            params, ds, batch_size=args.batch_size, max_batches=args.batches)
        ious = ", ".join(f"{v:.3f}" for v in metrics["per_class_iou"])
        print(f"mIoU {metrics['miou']:.4f}  pixel_acc "
              f"{metrics['pixel_acc']:.4f}\nper-class IoU: [{ious}]")

    if args.in_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        fwd = jax.jit(
            lambda p, x: jnp.argmax(bisenet_forward(p, x), axis=1))
        exts = {".jpg", ".jpeg", ".png", ".webp"}
        files = sorted(f for f in os.listdir(args.in_dir)
                       if os.path.splitext(f)[1].lower() in exts)
        for fn in files:
            img = Image.open(os.path.join(args.in_dir, fn)).convert("RGB")
            img = img.resize((args.size, args.size), Image.BILINEAR)
            arr = np.asarray(img, np.float32)
            x = ((arr / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
                 ).transpose(2, 0, 1)[None]
            parsing = np.asarray(fwd(params, jnp.asarray(x)))[0]
            vis = overlay_parsing(arr.astype(np.uint8), parsing)
            out_path = os.path.join(args.out_dir, fn)
            Image.fromarray(vis).save(out_path)
            print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
