"""Async training-sample logger.

Rebuild of the reference's async image-grid cache
(`cache_and_log_generations`, `ddpm.py:3775-3853`): generated/reconstructed
samples are pushed to a bounded queue and a worker thread saves
color-coded grids (border color per iteration type) without blocking the
train loop.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

ITER_TYPE_COLORS = {
    "recon": (64, 160, 64),  # green
    "unet_distill": (64, 64, 200),  # blue
    "comp_distill": (200, 64, 64),  # red
    "sample": (128, 128, 128),
}


def _to_grid(images: np.ndarray, cols: int = 4, border: int = 4,
             color=(128, 128, 128)) -> np.ndarray:
    """[N,3,H,W] float in [0,1] → bordered grid HWC uint8."""
    arr = (np.clip(images, 0, 1) * 255).astype(np.uint8).transpose(0, 2, 3, 1)
    n, h, w, _ = arr.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    bh, bw = h + 2 * border, w + 2 * border
    grid = np.zeros((rows * bh, cols * bw, 3), np.uint8)
    grid[...] = color
    for i, im in enumerate(arr):
        r, c = divmod(i, cols)
        grid[r * bh + border:r * bh + border + h,
             c * bw + border:c * bw + border + w] = im
    return grid


class SampleLogger:
    def __init__(self, log_dir: str, max_queue: int = 120):
        self.dir = os.path.join(log_dir, "samples")
        os.makedirs(self.dir, exist_ok=True)
        self.q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.dropped = 0

    def log(self, step: int, iter_type: str, images) -> bool:
        """Non-blocking enqueue; drops when the queue is full (the train
        loop must never stall on IO). Returns False if dropped."""
        try:
            self.q.put_nowait((step, iter_type, np.asarray(images)))
            return True
        except queue.Full:
            self.dropped += 1
            return False

    def _run(self):
        from PIL import Image

        while True:
            item = self.q.get()
            if item is None:
                return
            step, iter_type, images = item
            try:
                grid = _to_grid(
                    images, color=ITER_TYPE_COLORS.get(iter_type,
                                                       (128, 128, 128)))
                Image.fromarray(grid).save(
                    os.path.join(self.dir, f"{step:07d}_{iter_type}.png"))
            except Exception as e:  # never kill the worker
                print(f"sample logger error at step {step}: {e}")
            finally:
                self.q.task_done()

    def close(self, timeout: float = 10.0):
        self.q.join()
        self.q.put(None)
