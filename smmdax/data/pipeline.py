"""Dataset dispatch and the macro-batch iterator.

Reference parity (SURVEY.md component #9): per-dataset loaders with a
uniform "give me a batch" interface — CIFAR-10 from local binary
batches, CelebA from a JPEG directory (center-crop -> 160x160),
ImageNet 64x64 from npz shards, MNIST from idx files, plus the
GaussianMix toy.  All real loaders are asset-gated: if the files are
missing under ``data_dir`` the synthetic procedural source with the
same shapes is substituted (and a note is printed), because this
environment has no network egress.

The trainer consumes STACKED macro-batches shaped
(dsteps + gsteps, global_batch, H, W, C): one host->device transfer per
fused train step.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Protocol, Tuple

import numpy as np

from smmdax.configs import Config
from smmdax.data.synthetic import GaussianMix, SyntheticImages

Array = np.ndarray


class DataSource(Protocol):
    sample_shape: Tuple[int, ...]

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        """n samples; with ``key`` the batch is a pure function of
        (source seed, key) — the trainer passes the step index so the
        input pipeline is deterministically resumable (the stateless
        analog of checkpointing queue positions)."""
        ...


# ---------------------------------------------------------------------------
# real-dataset loaders (asset-gated)


class ArraySource:
    """In-memory dataset; shuffled minibatches in [-1, 1].

    uint8 data stays uint8 in memory (4x smaller than pre-normalized
    float) and each batch is assembled by the native C++ gather +
    normalize (+ optional flip) fast path (smmdax.data.native) — the
    queue-runner-equivalent host work of the reference, SURVEY.md #9.
    """

    def __init__(self, data: Array, seed: int = 0, flip: bool = False):
        self.data = data
        self.seed = seed
        self.flip = flip and data.ndim == 4
        self._rng = np.random.default_rng(seed)

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        return self.data.shape[1:]

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        idx = rng.integers(0, len(self.data), size=n)
        if self.data.dtype == np.uint8:
            from smmdax.data.native import gather_normalize
            flips = (rng.integers(0, 2, size=n).astype(np.uint8)
                     if self.flip else None)
            return gather_normalize(self.data, idx, flips)
        out = self.data[idx]
        if self.flip:
            m = rng.integers(0, 2, size=n).astype(bool)
            out = out.copy()
            out[m] = out[m][:, :, ::-1, :]
        return out

    def batch_u8(self, n: int, key: Optional[int] = None) -> Array:
        """Raw uint8 batch for on-device normalization (uint8_transfer);
        falls back to quantizing float data."""
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        idx = rng.integers(0, len(self.data), size=n)
        if self.data.dtype == np.uint8:
            out = self.data[idx]
            if self.flip:
                m = rng.integers(0, 2, size=n).astype(bool)
                out = out.copy()
                out[m] = out[m][:, :, ::-1, :]
            return out
        out = np.round((self.data[idx] + 1.0) * 127.5).astype(np.uint8)
        if self.flip:
            m = rng.integers(0, 2, size=n).astype(bool)
            out[m] = out[m][:, :, ::-1, :]
        return out


def _load_cifar10(data_dir: str) -> Optional[Array]:
    """CIFAR-10 python pickles (data_batch_1..5) -> (N,32,32,3) in [-1,1]."""
    root = os.path.join(data_dir, "cifar-10-batches-py")
    files = [os.path.join(root, f"data_batch_{i}") for i in range(1, 6)]
    if not all(os.path.exists(f) for f in files):
        return None
    arrs = []
    for f in files:
        with open(f, "rb") as fh:
            d = pickle.load(fh, encoding="bytes")
        arrs.append(np.asarray(d[b"data"], np.uint8))
    x = np.concatenate(arrs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(x)         # uint8; normalized per batch


def _load_npz_images(data_dir: str, subdir: str, size: int) -> Optional[Array]:
    """ImageNet-64-style npz shards with an 'data' array of uint8 images."""
    root = os.path.join(data_dir, subdir)
    if not os.path.isdir(root):
        return None
    shards = sorted(f for f in os.listdir(root) if f.endswith(".npz"))
    if not shards:
        return None
    arrs = []
    for s in shards:
        with np.load(os.path.join(root, s)) as z:
            d = z["data"] if "data" in z else z[list(z.keys())[0]]
        if d.ndim == 2:      # flattened CHW
            d = d.reshape(-1, 3, size, size).transpose(0, 2, 3, 1)
        arrs.append(np.asarray(d, np.uint8))
    return np.concatenate(arrs)            # uint8; normalized per batch


def center_crop_resize(img, size: int, crop: Optional[int] = None):
    """PIL image -> center-crop (``crop`` side, default shortest side)
    -> bilinear resize to (size, size).  Shared by the CelebA and LSUN
    decoders and the packing tool so the decode math can't drift."""
    from PIL import Image
    w, h = img.size
    # clamp to the shortest side: PIL silently zero-pads out-of-bounds
    # crop boxes, which would put black borders on every sample when
    # images are smaller than the requested crop
    c = min(w, h) if crop is None else min(crop, w, h)
    left, top = (w - c) // 2, (h - c) // 2
    img = img.crop((left, top, left + c, top + c))
    if size != c:
        img = img.resize((size, size), Image.BILINEAR)
    return img


class CelebASource:
    """JPEG directory -> center-crop -> resize to output_size, in [-1,1].

    Decoding happens lazily per batch via PIL (host side); the
    crop/resize matches the reference's 160x160 CelebA pipeline
    (center-crop 160 from the 178x218 aligned images, SURVEY.md #9).
    """

    def __init__(self, root: str, output_size: int = 160, crop: int = 160,
                 seed: int = 0):
        from PIL import Image  # noqa: F401  (import check)
        self.seed = seed
        self.root = root
        self.files = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        self.output_size = output_size
        self.crop = crop
        self._rng = np.random.default_rng(seed)

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        return (self.output_size, self.output_size, 3)

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        from PIL import Image
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        idx = rng.integers(0, len(self.files), size=n)
        out = np.empty((n, self.output_size, self.output_size, 3), np.float32)
        for i, j in enumerate(idx):
            img = center_crop_resize(Image.open(self.files[j]).convert("RGB"),
                                     self.output_size, crop=self.crop)
            out[i] = np.asarray(img, np.float32) / 127.5 - 1.0
        return out


class LSUNSource:
    """LSUN LMDB environment -> decode (webp/jpeg) -> center-crop the
    shortest side -> resize to output_size, in [-1, 1].

    Reads the LMDB B+tree directly through smmdax.data.lmdb_store (no
    ``lmdb`` package in this environment); random access over the key
    index keeps batches a pure function of (seed, step) like every
    other source (SURVEY.md #9 — the reference reads LSUN through the
    lmdb C library + TF queue runners; this is the stateless analog).
    """

    def __init__(self, lmdb_path: str, output_size: int = 64, seed: int = 0,
                 decode_threads: int = 8):
        from smmdax.data.lmdb_store import LMDBReader
        self.reader = LMDBReader(lmdb_path)
        if len(self.reader) == 0:
            raise FileNotFoundError(f"empty LMDB at {lmdb_path}")
        self.output_size = output_size
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        # PIL decode releases the GIL: a thread pool keeps per-batch
        # decode off the training critical path (decode of one 256px
        # webp is multiple ms; 384/step single-threaded would dominate
        # the ~21 ms device step).  For full-rate production training
        # use smmdax.data.convert to pack a decode-once uint8 cache.
        import concurrent.futures as cf
        self._pool = cf.ThreadPoolExecutor(max_workers=decode_threads)

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        return (self.output_size, self.output_size, 3)

    def decode_u8(self, i: int) -> Array:
        """One record -> (size, size, 3) uint8 (crop shortest side,
        bilinear resize) — also the conversion tool's unit of work."""
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(self.reader.value(i))).convert("RGB")
        return np.asarray(center_crop_resize(img, self.output_size), np.uint8)

    def _indices(self, n: int, key: Optional[int]) -> Array:
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        return rng.integers(0, len(self.reader), size=n)

    def batch_u8(self, n: int, key: Optional[int] = None) -> Array:
        idx = self._indices(n, key)
        out = np.empty((n, self.output_size, self.output_size, 3), np.uint8)
        for i, arr in enumerate(self._pool.map(self.decode_u8,
                                               (int(j) for j in idx))):
            out[i] = arr
        return out

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        return self.batch_u8(n, key).astype(np.float32) / 127.5 - 1.0


def _find_lsun_lmdb(root: str, category: str = "") -> Optional[str]:
    """data_dir/lsun may BE an environment, or contain one or more
    ``*_lmdb`` environment directories (the official LSUN layout).

    ``category`` selects the scene ("bedroom_train" matches
    ``bedroom_train_lmdb`` or an exact directory name).  With several
    environments present and no category this raises instead of
    silently training on an arbitrary scene."""
    if not os.path.isdir(root):
        return None
    if os.path.exists(os.path.join(root, "data.mdb")):
        return root
    envs = sorted(d for d in os.listdir(root)
                  if os.path.exists(os.path.join(root, d, "data.mdb")))
    if category:
        matches = [d for d in envs if d in (category, category + "_lmdb")]
        if not matches:
            raise FileNotFoundError(
                f"lsun_category={category!r} not found under {root}; "
                f"available environments: {envs}")
        chosen = matches[0]
    elif len(envs) > 1:
        raise ValueError(
            f"multiple LSUN environments under {root}: {envs}; select one "
            "with --lsun_category")
    elif envs:
        chosen = envs[0]
    else:
        return None
    print(f"[smmdax.data] LSUN environment: {chosen}")
    return os.path.join(root, chosen)


# ---------------------------------------------------------------------------
# dispatch


def _try_tfrecords(cfg: Config, subdir: str):
    """TFRecord shards under data_dir/<subdir> (reference reads
    LSUN/ImageNet this way, SURVEY.md #9)."""
    root = os.path.join(cfg.data_dir, subdir)
    if not os.path.isdir(root):
        return None
    if not any(".tfrecord" in f for f in os.listdir(root)):
        return None
    from smmdax.data.tfrecord import TFRecordSource
    crop = 160 if subdir == "celeba" else None
    return TFRecordSource(root, cfg.output_size, crop=crop,
                          seed=cfg.random_seed)


def make_dataset(cfg: Config) -> DataSource:
    ds = cfg.dataset
    if ds == "gaussian_mix":
        return GaussianMix(seed=cfg.random_seed)
    if ds == "synthetic":
        return SyntheticImages(cfg.output_size, cfg.c_dim, seed=cfg.random_seed)
    if ds == "cifar10":
        data = _load_cifar10(cfg.data_dir)
        if data is not None:
            return ArraySource(data, seed=cfg.random_seed)
    elif ds == "imagenet64":
        data = _load_npz_images(cfg.data_dir, "imagenet64", 64)
        if data is not None:
            return ArraySource(data, seed=cfg.random_seed)
        src = _try_tfrecords(cfg, "imagenet64")
        if src is not None:
            return src
    elif ds == "mnist":
        path = os.path.join(cfg.data_dir, "mnist", "train-images-idx3-ubyte")
        if os.path.exists(path):
            with open(path, "rb") as f:
                f.read(16)
                x = np.frombuffer(f.read(), np.uint8).reshape(-1, 28, 28, 1)
            return ArraySource(x.copy(), seed=cfg.random_seed)
    elif ds in ("lsun", "celeba"):
        # fastest path first: a decode-once packed uint8 cache (memmap +
        # C++ gather; built by ``python -m smmdax.data.convert``).
        # With --lsun_category set, ONLY the per-scene cache is
        # accepted — the generic packed file records no provenance and
        # could have been built from a different scene.
        from smmdax.data.convert import load_packed, packed_path
        category = cfg.lsun_category if ds == "lsun" else ""
        packed = load_packed(packed_path(cfg.data_dir, ds, cfg.output_size,
                                         category=category))
        if packed is not None:
            return ArraySource(packed, seed=cfg.random_seed)
        if category:
            generic = load_packed(
                packed_path(cfg.data_dir, ds, cfg.output_size))
            if generic is not None:
                print(f"[smmdax.data] ignoring category-less packed cache "
                      f"(lsun_category={category!r} requested; repack with "
                      f"out={packed_path(cfg.data_dir, ds, cfg.output_size, category=category)!r})")
        if ds == "lsun":
            lmdb_env = _find_lsun_lmdb(os.path.join(cfg.data_dir, "lsun"),
                                       category=cfg.lsun_category)
            if lmdb_env is not None:
                return LSUNSource(lmdb_env, cfg.output_size,
                                  seed=cfg.random_seed)
        src = _try_tfrecords(cfg, ds)
        if src is not None:
            return src
        root = os.path.join(cfg.data_dir, ds)
        if os.path.isdir(root):
            try:
                # shortest-side crop (crop=None) for LSUN loose JPEGs —
                # the LMDB/TFRecord/packed paths crop the full shortest
                # side, and the CelebA default (160) would train on a
                # different image distribution for the same dataset
                crop = None if ds == "lsun" else 160
                return CelebASource(root, cfg.output_size,
                                    seed=cfg.random_seed, crop=crop)
            except FileNotFoundError:
                pass
    print(f"[smmdax.data] assets for {ds!r} not found under {cfg.data_dir}; "
          "substituting the procedural synthetic source with matching shapes")
    return SyntheticImages(cfg.output_size, cfg.c_dim, seed=cfg.random_seed)


def macro_batches(source: DataSource, per_step: int, batch: int,
                  start_step: int = 0) -> Iterator[Array]:
    """Yield (per_step, batch, *sample_shape) stacked arrays forever,
    keyed by step index (deterministic + resumable)."""
    step = start_step
    while True:
        yield macro_batch_at(source, step, per_step, batch)
        step += 1


def macro_batch_at(source: DataSource, step: int, per_step: int,
                   batch: int) -> Array:
    flat = source.batch(per_step * batch, key=step)
    return flat.reshape((per_step, batch) + flat.shape[1:])


# key for the device-resident pool draw; the trainer's step keys are
# step indices, scoring uses 2**31 + 1 and the toy visualizer 2**31,
# so this draw never collides with either stream
_POOL_KEY = 2**31 + 2


def materialize_u8(source: DataSource, pool: int = 0) -> Optional[Array]:
    """The dataset as ONE uint8 (N, H, W, C) array, for HBM residence
    (``data_placement=device``): in-memory array sources hand over their
    backing array; procedural / decode-on-demand sources with a
    ``batch_u8`` draw a fixed ``pool``-sample training set once (keyed
    off the step range, so it is deterministic and disjoint from the
    step/scoring streams).  Returns None when neither is possible
    (float vector sources like the GaussianMix toy)."""
    if getattr(source, "flip", False):
        # the resident dataset is gathered in-program with no host-side
        # transform hook — a silent flip drop would change the training
        # distribution the caller asked for
        raise ValueError("data_placement=device cannot honor flip "
                         "augmentation (batches are gathered in-program "
                         "from the resident pool); disable one of them")
    data = getattr(source, "data", None)
    if isinstance(data, np.ndarray) and data.ndim == 4:
        if data.dtype == np.uint8:
            return data
        return np.round((np.asarray(data) + 1.0) * 127.5).astype(np.uint8)
    if pool > 0 and hasattr(source, "batch_u8"):
        return source.batch_u8(pool, key=_POOL_KEY)
    return None
