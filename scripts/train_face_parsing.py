"""Train the BiSeNet face parser (rebuild of `face_parsing/train.py`).

Usage:
  python scripts/train_face_parsing.py --data_root <root with images/ labels/>
      [--max_iter 80000] [--batch_size 16] [--crop_size 448] [--out ckpt.npz]

The reference trains with OHEM CE on main + 2 aux heads, SGD momentum 0.9,
wd 5e-4, warmup 1000 → poly 0.9 decay, 10× LR on FFM/output heads
(`face_parsing/train.py:60-141`, `optimizer.py`). Training-mode BN is the
fused Pallas BN+activation kernel standing in for the reference's
InPlace-ABN CUDA extension.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adaface_tpu.models.bisenet import init_bisenet_params
from adaface_tpu.train.face_parsing_train import (
    FaceMaskDataset, FaceParsingTrainConfig, make_face_parsing_optimizer,
    make_face_parsing_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--max_iter", type=int, default=80_000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--crop_size", type=int, default=448)
    ap.add_argument("--lr0", type=float, default=1e-2)
    ap.add_argument("--out", default="face_parsing_ckpt.npz")
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = FaceParsingTrainConfig(
        lr0=args.lr0, max_iter=args.max_iter,
        crop_size=args.crop_size, batch_size=args.batch_size)
    params = init_bisenet_params(jax.random.PRNGKey(args.seed))
    opt = make_face_parsing_optimizer(cfg, params)
    opt_state = opt.init(params)
    step_fn = make_face_parsing_train_step(cfg, opt)

    ds = FaceMaskDataset(args.data_root, crop_size=args.crop_size,
                         seed=args.seed)
    print(f"dataset: {len(ds)} images")

    t0 = time.time()
    for it, (images, labels) in enumerate(
            ds.batches(args.batch_size, args.max_iter)):
        params, opt_state, metrics = step_fn(
            params, opt_state, images, labels.astype(np.int32))
        if (it + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (it + 1) / (time.time() - t0)
            print(f"it {it + 1}/{args.max_iter} loss {m['loss']:.4f} "
                  f"(main {m['loss_main']:.4f}) {rate:.2f} it/s")

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    np.savez(args.out, **{jax.tree_util.keystr(k): np.asarray(v)
                          for k, v in flat})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
