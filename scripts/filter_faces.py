"""Dataset face filtering + dedup utilities
(`scripts-private/{filter_faces,knn-faces,comparefaces}.py` equivalents).

    python scripts/filter_faces.py filter  --in_dir d/ [--trash_dir t/]
    python scripts/filter_faces.py dedup   --in_dir d/ --thres 0.95
    python scripts/filter_faces.py compare --a imgs_a/ --b imgs_b/
    python scripts/filter_faces.py knn     --in_dir d/ --query img.png -k 5
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _embed_folder(folder):
    from adaface_tpu.evaluation.face_sim import load_folder_images
    from adaface_tpu.id2ada.face_backends import default_backend

    be = default_backend()
    from PIL import Image

    exts = {".jpg", ".jpeg", ".png", ".webp", ".bmp"}
    paths = sorted(os.path.join(folder, f) for f in os.listdir(folder)
                   if os.path.splitext(f)[1].lower() in exts
                   and not f.endswith("_mask.png"))
    embs, kept = [], []
    for p in paths:
        e = be.detect_and_embed(np.asarray(Image.open(p).convert("RGB")))
        if e is not None:
            embs.append(e)
            kept.append(p)
    return (np.stack(embs) if embs else np.zeros((0, 512), np.float32),
            kept, paths)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("filter")
    p.add_argument("--in_dir", required=True)
    p.add_argument("--trash_dir", default=None)
    p = sub.add_parser("dedup")
    p.add_argument("--in_dir", required=True)
    p.add_argument("--thres", type=float, default=0.95)
    p.add_argument("--trash_dir", default=None)
    p = sub.add_parser("compare")
    p.add_argument("--a", required=True)
    p.add_argument("--b", required=True)
    p = sub.add_parser("knn")
    p.add_argument("--in_dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("-k", type=int, default=5)
    args = ap.parse_args()

    if args.cmd == "filter":
        embs, kept, paths = _embed_folder(args.in_dir)
        bad = sorted(set(paths) - set(kept))
        for p in bad:
            if args.trash_dir:
                os.makedirs(args.trash_dir, exist_ok=True)
                shutil.move(p, os.path.join(args.trash_dir,
                                            os.path.basename(p)))
        print(f"{len(kept)} with faces, {len(bad)} without"
              + (" (moved)" if args.trash_dir else ""))
    elif args.cmd == "dedup":
        embs, kept, _ = _embed_folder(args.in_dir)
        sim = embs @ embs.T
        drop = set()
        for i in range(len(kept)):
            if i in drop:
                continue
            for j in range(i + 1, len(kept)):
                if sim[i, j] > args.thres:
                    drop.add(j)
        for j in sorted(drop):
            if args.trash_dir:
                os.makedirs(args.trash_dir, exist_ok=True)
                shutil.move(kept[j], os.path.join(
                    args.trash_dir, os.path.basename(kept[j])))
            print(f"dup: {kept[j]}")
        print(f"{len(drop)} near-duplicates (cos > {args.thres})")
    elif args.cmd == "compare":
        from adaface_tpu.evaluation.eval_utils import compare_face_folders

        print(compare_face_folders(args.a, args.b))
    elif args.cmd == "knn":
        from PIL import Image

        from adaface_tpu.id2ada.face_backends import default_backend

        embs, kept, _ = _embed_folder(args.in_dir)
        q = default_backend().detect_and_embed(
            np.asarray(Image.open(args.query).convert("RGB")))
        if q is None:
            raise SystemExit("no face in query image")
        sims = embs @ q
        for idx in np.argsort(-sims)[: args.k]:
            print(f"{sims[idx]:.4f}  {kept[idx]}")


if __name__ == "__main__":
    main()
