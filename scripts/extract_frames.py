"""Extract N evenly-spaced frames from a video (`scripts/extract-frames.py`
equivalent: evenly-spaced index sampling, `{out}_{i}.png` outputs, refuse
to write a partial set when the video is shorter than N frames).

    python scripts/extract_frames.py video.mp4 out/frame 16
"""

from __future__ import annotations

import sys


def extract_frames(video_path: str, out_prefix: str, num_frames: int) -> bool:
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total < num_frames:
        cap.release()
        print(f"Number of frames must be >= {num_frames} (video has {total})")
        return False
    indices = np.linspace(0, max(total - 1, 0), num_frames, dtype=int)
    frames = []
    failed = []
    for i in indices:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, frame = cap.read()
        if ok:
            frames.append(frame)
        else:
            failed.append(int(i))
    cap.release()
    if len(frames) != num_frames:
        print(f"failed to decode frame(s) at indices {failed} "
              f"(read {len(frames)}/{num_frames}, video reports {total} total)")
        return False
    for i, frame in enumerate(frames):
        cv2.imwrite(f"{out_prefix}_{i}.png", frame)
    print(f"Frames extracted to {out_prefix}_*.png")
    return True


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(2)
    ok = extract_frames(sys.argv[1], sys.argv[2], int(sys.argv[3]))
    sys.exit(0 if ok else 1)
