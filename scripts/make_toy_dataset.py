"""Generate a tiny synthetic training dataset for integration soaks.

Two subjects x N images with fg masks, captions, and metainfo.json —
the layout `PersonalizedBase` scans (`ldm/data/personalized.py:185-278`
in the reference). Images are smooth random blobs with a bright
center-face-like disc so the Haar-cascade / brightness detectors find a
stable "face" region.

    python scripts/make_toy_dataset.py /tmp/toy_faces --n 4 --size 512
"""

import argparse
import json
import os

import numpy as np
from PIL import Image


def make_image(rs: np.random.RandomState, size: int) -> np.ndarray:
    base = rs.randint(30, 90, (size // 8, size // 8, 3), np.uint8)
    img = np.asarray(Image.fromarray(base).resize((size, size),
                                                  Image.BILINEAR))
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy = size / 2 + rs.uniform(-size / 8, size / 8)
    cx = size / 2 + rs.uniform(-size / 8, size / 8)
    r = size * rs.uniform(0.18, 0.25)
    disc = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
    img = np.clip(img.astype(np.float32) + disc[..., None] * 140, 0,
                  255).astype(np.uint8)
    return img, (cx, cy, r)


def make_mask(size: int, cx: float, cy: float, r: float) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    return (((yy - cy) ** 2 + (xx - cx) ** 2) <= (1.6 * r) ** 2).astype(
        np.uint8) * 255


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    meta = {}
    for si, (name, cls) in enumerate((("alice", "woman"), ("bob", "man"))):
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        rs = np.random.RandomState(1000 + si)
        for i in range(args.n):
            img, (cx, cy, r) = make_image(rs, args.size)
            Image.fromarray(img).save(os.path.join(d, f"{i}.png"))
            Image.fromarray(make_mask(args.size, cx, cy, r)).save(
                os.path.join(d, f"{i}_mask.png"))
            with open(os.path.join(d, f"{i}.txt"), "w") as f:
                f.write(f"a photo of {name}")
        meta[name] = {"cls_delta_string": cls}
    with open(os.path.join(args.out, "metainfo.json"), "w") as f:
        json.dump(meta, f)
    print(f"wrote 2 subjects x {args.n} images at {args.size}px -> "
          f"{args.out}")


if __name__ == "__main__":
    main()
