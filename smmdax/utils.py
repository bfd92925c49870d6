"""Utilities: image grids, metric logging, timers (SURVEY.md #12,
the reference's core/utils.py: save_images montage, inverse_transform,
dir setup, stdout-tee Logger)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np

Array = np.ndarray


def inverse_transform(images: Array) -> Array:
    """[-1, 1] -> [0, 1] (the reference's inverse_transform)."""
    return (np.asarray(images) + 1.0) / 2.0


def make_grid(images: Array, nrow: Optional[int] = None, pad: int = 2) -> Array:
    """(N, H, W, C) in [0,1] -> one (gh, gw, C) montage in [0,1]."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    if nrow is None:
        nrow = int(np.ceil(np.sqrt(n)))
    ncol = int(np.ceil(n / nrow))
    grid = np.ones((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c),
                   images.dtype)
    for i in range(n):
        r, col = divmod(i, nrow)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_images(images: Array, path: str, nrow: Optional[int] = None) -> None:
    """Save a [-1,1] image batch as one PNG montage (reference
    save_images)."""
    from PIL import Image
    grid = make_grid(inverse_transform(images), nrow=nrow)
    arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


class MetricWriter:
    """Structured metrics: JSONL on disk + stdout lines + optional
    TensorBoard event files (the reference used tf.summary exclusively;
    JSONL is the primary machine-readable record here, TensorBoard is
    opt-in via the installed TF2 CPU package).  SURVEY.md §5
    observability row."""

    def __init__(self, log_dir: str, run_name: str, also_stdout: bool = True,
                 tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self.also_stdout = also_stdout
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb", run_name))
            except Exception as e:
                print(f"[smmdax] tensorboard writer unavailable ({e})")

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        if self.also_stdout:
            # ints (step, counters) print as ints — "%.5g" turns step
            # 113000 into 1.13e+05 on long runs
            body = " ".join(
                f"{k}={v}" if isinstance(v, int) else f"{k}={v:.5g}"
                for k, v in rec.items() if k not in ("time",))
            print(f"[smmdax] {body}", flush=True)
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default(step=int(step)):
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v))
            self._tb.flush()

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock images/sec accounting for the train loop."""

    def __init__(self):
        self.t0 = time.time()
        self.images = 0

    def add(self, n: int) -> None:
        self.images += n

    def rate(self) -> float:
        dt = time.time() - self.t0
        return self.images / dt if dt > 0 else 0.0

    def reset(self) -> None:
        self.t0 = time.time()
        self.images = 0
