"""Decode-once dataset packing (production ingestion path).

Per-batch JPEG/webp decode (CelebA dirs, LSUN LMDBs) costs multiple ms
per image on the host — far more than the ~21 ms device macro-step can
hide at batch 384/step.  The production answer is the same one the
packed CIFAR/ImageNet64 formats embody: decode + crop + resize ONCE
into a packed uint8 array, then train through ``ArraySource`` (C++
gather fast path, uint8 device transfer, O(1) random access via
memmap).

    python -m smmdax.data.convert lsun   data/lsun/bedroom_train_lmdb  data/lsun/packed_64.npy  --size 64
    python -m smmdax.data.convert images data/celeba                   data/celeba/packed_160.npy --size 160 --crop 160

``make_dataset`` picks the packed file up automatically:
``data_dir/lsun/packed_<output_size>.npy`` / ``data_dir/celeba/...``
(memmapped — a packed 3M-image LSUN at 64px is ~36 GB on disk, paged
in on demand, never fully resident).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def pack_lsun(lmdb_path: str, out_path: str, size: int,
              limit: Optional[int] = None, threads: int = 8,
              log_every: int = 10_000) -> str:
    """LSUN LMDB environment -> packed (N, size, size, 3) uint8 .npy."""
    from smmdax.data.pipeline import LSUNSource
    src = LSUNSource(lmdb_path, output_size=size, decode_threads=threads)
    n = len(src.reader) if limit is None else min(limit, len(src.reader))
    out = np.lib.format.open_memmap(out_path, mode="w+", dtype=np.uint8,
                                    shape=(n, size, size, 3))
    # chunked submission: Executor.map materializes one future per item
    # up front, which at LSUN scale (~3M records) is multi-GB of host
    # bookkeeping before the first write — bound the in-flight window
    chunk = max(threads * 64, 512)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        for i, arr in enumerate(src._pool.map(src.decode_u8,
                                              range(start, stop))):
            out[start + i] = arr
        if log_every and (stop % log_every < chunk or stop == n):
            print(f"[smmdax.convert] {stop}/{n}")
    out.flush()
    return out_path


def pack_image_dir(root: str, out_path: str, size: int,
                   crop: Optional[int] = None,
                   limit: Optional[int] = None,
                   log_every: int = 10_000) -> str:
    """JPEG/PNG directory (CelebA layout) -> packed uint8 .npy.

    ``crop``: center-crop side before resizing (the reference's CelebA
    pipeline crops 160 from the 178x218 aligned images); default crops
    the shortest side.
    """
    from PIL import Image

    from smmdax.data.pipeline import center_crop_resize
    files = sorted(os.path.join(root, f) for f in os.listdir(root)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    if limit is not None:
        files = files[:limit]
    out = np.lib.format.open_memmap(out_path, mode="w+", dtype=np.uint8,
                                    shape=(len(files), size, size, 3))
    for i, path in enumerate(files):
        img = center_crop_resize(Image.open(path).convert("RGB"), size,
                                 crop=crop)
        out[i] = np.asarray(img, np.uint8)
        if log_every and (i + 1) % log_every == 0:
            print(f"[smmdax.convert] {i + 1}/{len(files)}")
    out.flush()
    return out_path


def packed_path(data_dir: str, dataset: str, size: int,
                category: str = "") -> str:
    """Default packed-cache location.  For LSUN with a category the
    cache is per-scene (``packed_bedroom_train_64.npy``) so a cache
    built from one scene can never silently serve another."""
    tag = f"packed_{category}_{size}.npy" if category else f"packed_{size}.npy"
    return os.path.join(data_dir, dataset, tag)


def load_packed(path: str) -> Optional[np.ndarray]:
    """Memmap a packed uint8 array if present and well-formed."""
    if not os.path.exists(path):
        return None
    arr = np.load(path, mmap_mode="r")
    if arr.dtype != np.uint8 or arr.ndim != 4:
        print(f"[smmdax.convert] ignoring malformed packed file {path} "
              f"(dtype={arr.dtype}, ndim={arr.ndim})")
        return None
    return arr


def main(argv=None) -> None:
    p = argparse.ArgumentParser("smmdax.data.convert", description=__doc__)
    p.add_argument("kind", choices=["lsun", "images"])
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--crop", type=int, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--threads", type=int, default=8)
    a = p.parse_args(argv)
    if a.kind == "lsun":
        pack_lsun(a.src, a.out, a.size, limit=a.limit, threads=a.threads)
    else:
        pack_image_dir(a.src, a.out, a.size, crop=a.crop, limit=a.limit)
    print(f"[smmdax.convert] wrote {a.out}")


if __name__ == "__main__":
    main()
