"""Face-embedding dataset utilities: knn dedup, folder compare, detection.

Replaces scripts-private/{knn-faces,comparefaces,face_det}.py in the
reference (SURVEY §2.7): embedding-space k-nearest-neighbour listing /
dedup of a subject folder, all-pairs face-similarity between two folders,
and a plain detection report (bbox + confidence per image).

    python scripts/face_tool.py knn     <folder> -k 5 [--dedup_thres 0.95]
    python scripts/face_tool.py compare <folder_a> <folder_b>
    python scripts/face_tool.py det     <folder>
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def _folder_paths(folder: str) -> list[str]:
    exts = {".jpg", ".jpeg", ".png", ".webp", ".bmp"}
    return sorted(os.path.join(folder, f) for f in os.listdir(folder)
                  if os.path.splitext(f)[1].lower() in exts
                  and not f.endswith("_mask.png"))


def _embed_folder(folder: str, backend):
    from PIL import Image

    embs, kept = [], []
    for p in _folder_paths(folder):
        e = backend.detect_and_embed(np.asarray(Image.open(p).convert("RGB")))
        if e is not None:
            embs.append(e)
            kept.append(p)
    return (np.stack(embs) if embs else np.zeros((0, 512), np.float32)), kept


def cmd_knn(args, backend):
    embs, paths = _embed_folder(args.folder, backend)
    if len(paths) < 2:
        print(f"only {len(paths)} faces found, nothing to do")
        return
    sim = embs @ embs.T  # embeddings are L2-normalized
    np.fill_diagonal(sim, -1.0)
    dups = set()
    for i, p in enumerate(paths):
        order = np.argsort(-sim[i])[:args.k]
        row = ", ".join(f"{os.path.basename(paths[j])}:{sim[i, j]:.3f}"
                        for j in order)
        print(f"{os.path.basename(p)} -> {row}")
        # greedy dedup: mark the later file of any pair above the threshold
        for j in order:
            if sim[i, j] >= args.dedup_thres and j > i:
                dups.add(paths[j])
    if dups:
        print(f"\n{len(dups)} near-duplicates (sim >= {args.dedup_thres}):")
        for p in sorted(dups):
            print(f"  {p}")
        if args.rm:
            for p in sorted(dups):
                os.remove(p)
            print("removed.")


def cmd_compare(args, backend):
    embs_a, _ = _embed_folder(args.folder_a, backend)
    embs_b, _ = _embed_folder(args.folder_b, backend)
    if not len(embs_a) or not len(embs_b):
        print("no faces found in one of the folders")
        return
    from adaface_tpu.evaluation.face_sim import calc_faces_similarities

    sim = calc_faces_similarities(embs_a, embs_b)
    print(f"{args.folder_a} ({len(embs_a)}) vs {args.folder_b} "
          f"({len(embs_b)}): avg face sim {sim:.4f}")


def cmd_det(args, backend):
    from PIL import Image

    n_ok = 0
    paths = _folder_paths(args.folder)
    for p in paths:
        e = backend.detect_and_embed(np.asarray(Image.open(p).convert("RGB")))
        status = "face" if e is not None else "NO FACE"
        n_ok += e is not None
        print(f"{status:8s} {p}")
    print(f"\n{n_ok}/{len(paths)} images with a detected face")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("knn")
    p.add_argument("folder")
    p.add_argument("-k", type=int, default=5)
    p.add_argument("--dedup_thres", type=float, default=0.95)
    p.add_argument("--rm", action="store_true",
                   help="delete near-duplicates (off by default)")

    p = sub.add_parser("compare")
    p.add_argument("folder_a"), p.add_argument("folder_b")

    p = sub.add_parser("det")
    p.add_argument("folder")

    args = ap.parse_args()
    from adaface_tpu.id2ada.face_backends import default_backend

    backend = default_backend()
    {"knn": cmd_knn, "compare": cmd_compare, "det": cmd_det}[args.cmd](
        args, backend)


if __name__ == "__main__":
    main()
