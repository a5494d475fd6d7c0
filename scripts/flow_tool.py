"""Optical-flow sanity CLI (`gma/test.py` + `gma/utils/flow_viz.py`
equivalent): estimate GMA flow between two images and save a Middlebury
color-wheel visualization.

    python scripts/flow_tool.py img1.png img2.png --out flow.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img1")
    ap.add_argument("img2")
    ap.add_argument("--out", default="flow.png")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--size", type=int, default=256,
                    help="resize inputs to this square size")
    args = ap.parse_args()

    import jax
    from PIL import Image

    from adaface_tpu.models.gma import flow_to_image, gma_flow, init_gma_params

    def load(p):
        im = Image.open(p).convert("RGB").resize((args.size, args.size),
                                                 Image.BILINEAR)
        x = np.asarray(im, np.float32) / 127.5 - 1.0
        return x.transpose(2, 0, 1)[None]  # [1,3,H,W]

    i1, i2 = load(args.img1), load(args.img2)
    params = init_gma_params(jax.random.PRNGKey(0))
    flow = gma_flow(params, i1, i2, num_iters=args.iters)
    flow = np.asarray(flow[0]).transpose(1, 2, 0)  # [H,W,2]
    Image.fromarray(flow_to_image(flow)).save(args.out)
    mag = np.sqrt((flow ** 2).sum(-1))
    print(f"flow: mean |f| = {mag.mean():.3f}, max |f| = {mag.max():.3f} "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
