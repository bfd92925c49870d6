"""Synthesize FULL-SIZE on-disk datasets in every real storage format.

The environment has no network, so the real CIFAR/CelebA/LSUN/ImageNet
assets cannot exist here — but the LOADERS must still be proven under
production volume (VERDICT r3 item 5: "any loader that only ever ran on
64-sample fixtures has now moved real volume").  This tool writes
byte-format-exact stand-ins:

* ``cifar-10-batches-py/data_batch_1..5`` — python pickles with the
  real dict layout ({b'data': (10000, 3072) uint8 CHW-flattened,
  b'labels': [...]}), 50k samples.
* ``celeba/*.jpg`` — aligned-CelebA-shaped JPEGs (178x218), decoded +
  center-cropped at load time like the real pipeline.
* ``lsun/bedroom_train_lmdb/data.mdb`` — a real LMDB B+tree environment
  (written by smmdax.data.lmdb_store.write_lmdb) of JPEG-encoded
  ~256px records, read back through the from-scratch LMDB reader.
* ``imagenet64/*.npz`` — Downsampled-ImageNet-style shards with a
  flattened-CHW uint8 'data' array.
* ``mnist/train-images-idx3-ubyte`` — the idx format header + rasters.

Images are procedural low-frequency fields (JPEG-compressible, so
encode/decode exercise realistic byte sizes), deterministic per index.

Usage: python tools/make_assets.py --out /tmp/smmdax_assets \
           [--cifar_n 50000] [--celeba_n 10000] [--lsun_n 10000]
           [--imagenet_n 50000] [--only cifar,celeba,...]
"""

from __future__ import annotations

import argparse
import io
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _proc_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Low-frequency random field + mild noise: photo-like enough that
    JPEG sizes are realistic (pure uint8 noise barely compresses)."""
    from PIL import Image
    base = rng.integers(0, 256, (12, 12, 3), np.uint8)
    img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, np.int16)
    noise = rng.integers(-10, 11, arr.shape, dtype=np.int16)
    return np.clip(arr + noise, 0, 255).astype(np.uint8)


def make_cifar(root: str, n: int) -> None:
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(101)
    per = n // 5
    for b in range(1, 6):
        imgs = np.stack([_proc_image(rng, 32, 32) for _ in range(per)])
        flat = imgs.transpose(0, 3, 1, 2).reshape(per, -1)   # CHW flattened
        with open(os.path.join(d, f"data_batch_{b}"), "wb") as f:
            pickle.dump({b"data": flat,
                         b"labels": rng.integers(0, 10, per).tolist()}, f)
        print(f"  cifar batch {b}/5 ({per} samples)", flush=True)


def make_celeba(root: str, n: int) -> None:
    from PIL import Image
    d = os.path.join(root, "celeba")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(102)
    for i in range(n):
        # the aligned CelebA geometry: 178x218 (w x h)
        Image.fromarray(_proc_image(rng, 218, 178)).save(
            os.path.join(d, f"{i:06d}.jpg"), quality=88)
        if (i + 1) % 2500 == 0:
            print(f"  celeba {i + 1}/{n} jpegs", flush=True)


def make_lsun(root: str, n: int, size: int = 256,
              category: str = "bedroom_train") -> None:
    from PIL import Image

    from smmdax.data.lmdb_store import write_lmdb
    env = os.path.join(root, "lsun", f"{category}_lmdb")
    rng = np.random.default_rng(103)

    def items():
        for i in range(n):
            buf = io.BytesIO()
            Image.fromarray(_proc_image(rng, size, size)).save(
                buf, format="JPEG", quality=85)
            # LSUN keys are opaque hashes; any sorted byte key works
            yield (f"{i:016x}".encode(), buf.getvalue())

    write_lmdb(env, items())
    sz = os.path.getsize(os.path.join(env, "data.mdb")) / 1e6
    print(f"  lsun {n} records -> {env} ({sz:.0f} MB)", flush=True)


def make_imagenet64(root: str, n: int, shards: int = 5) -> None:
    d = os.path.join(root, "imagenet64")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(104)
    per = n // shards
    for s in range(shards):
        imgs = np.stack([_proc_image(rng, 64, 64) for _ in range(per)])
        flat = imgs.transpose(0, 3, 1, 2).reshape(per, -1)   # CHW flattened
        np.savez(os.path.join(d, f"train_data_batch_{s + 1}.npz"), data=flat)
        print(f"  imagenet64 shard {s + 1}/{shards} ({per} samples)",
              flush=True)


def make_mnist(root: str, n: int = 10000) -> None:
    d = os.path.join(root, "mnist")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(105)
    imgs = np.stack([_proc_image(rng, 28, 28)[..., 0] for _ in range(n)])
    with open(os.path.join(d, "train-images-idx3-ubyte"), "wb") as f:
        f.write((2051).to_bytes(4, "big") + n.to_bytes(4, "big")
                + (28).to_bytes(4, "big") + (28).to_bytes(4, "big"))
        f.write(imgs.tobytes())
    print(f"  mnist {n} rasters", flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--cifar_n", type=int, default=50_000)
    ap.add_argument("--celeba_n", type=int, default=10_000)
    ap.add_argument("--lsun_n", type=int, default=10_000)
    ap.add_argument("--imagenet_n", type=int, default=50_000)
    ap.add_argument("--mnist_n", type=int, default=10_000)
    ap.add_argument("--only", default="",
                    help="comma list of cifar,celeba,lsun,imagenet64,mnist")
    args = ap.parse_args(argv)
    only = set(filter(None, args.only.split(",")))

    def want(name):
        return not only or name in only

    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    if want("cifar"):
        make_cifar(args.out, args.cifar_n)
    if want("celeba"):
        make_celeba(args.out, args.celeba_n)
    if want("lsun"):
        make_lsun(args.out, args.lsun_n)
    if want("imagenet64"):
        make_imagenet64(args.out, args.imagenet_n)
    if want("mnist"):
        make_mnist(args.out, args.mnist_n)
    print(f"assets under {args.out} in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
