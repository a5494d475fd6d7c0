"""Video face-similarity evaluation (`scripts/eval_videos.py` equivalent).

Samples frames from generated videos (motion-ratio frame selection:
prefer frames that differ from their neighbors, skipping static
padding), embeds faces, and scores against reference images:

    python scripts/eval_videos.py --videos vids/ --ref_images subj/ \
        [--frames_per_video 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sample_frames(video_path: str, n_frames: int = 8,
                  motion_percentile: float = 50.0) -> list[np.ndarray]:
    """Read a video and pick n frames with above-median inter-frame motion
    (`eval_videos.py` motion-ratio selection)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    frames = []
    ok, prev = cap.read()
    motions = []
    while ok:
        frame = prev
        ok, nxt = cap.read()
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if ok:
            motions.append(float(np.abs(
                nxt.astype(np.int16) - frame.astype(np.int16)).mean()))
            prev = nxt
    cap.release()
    if not frames:
        return []
    if motions:
        thres = np.percentile(motions, motion_percentile)
        moving = [i for i, m in enumerate(motions) if m >= thres]
        idxs = moving or list(range(len(frames)))
    else:
        idxs = list(range(len(frames)))
    step = max(len(idxs) // n_frames, 1)
    return [frames[i] for i in idxs[::step][:n_frames]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", required=True, help="video file or folder")
    ap.add_argument("--ref_images", required=True)
    ap.add_argument("--frames_per_video", type=int, default=8)
    ap.add_argument("--scores_csv", default=None)
    args = ap.parse_args()

    from adaface_tpu.evaluation.eval_utils import append_score_row
    from adaface_tpu.evaluation.face_sim import (
        compare_face_images, load_folder_images)

    exts = {".mp4", ".avi", ".mov", ".webm", ".gif"}
    if os.path.isdir(args.videos):
        vids = sorted(
            os.path.join(args.videos, f) for f in os.listdir(args.videos)
            if os.path.splitext(f)[1].lower() in exts)
    else:
        vids = [args.videos]
    refs = load_folder_images(args.ref_images)

    for v in vids:
        frames = sample_frames(v, args.frames_per_video)
        if not frames:
            print(f"{v}: no frames")
            continue
        scores = compare_face_images(frames, refs)
        row = {"video": os.path.basename(v), **scores}
        print(row)
        if args.scores_csv:
            append_score_row(args.scores_csv, row)


if __name__ == "__main__":
    main()
