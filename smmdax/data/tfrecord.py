"""TFRecord ingestion (SURVEY.md component #9: the reference reads
LSUN/ImageNet from TFRecords).

Design: TFRecords are a sequential format, but the trainer needs
deterministic RANDOM access (batches are a pure function of (seed,
step) for exact resume).  So the loader scans each file once at startup
to build an offset index (cheap: header-hopping, no payload reads),
then serves batches by seek+read.  tf.train.Example protos are parsed
with the installed TF2 package (CPU) — only the proto class is used,
no tf.data / no graph runtime.

Supported record layouts:
  * raw bytes feature  'image'/'data' + optional 'shape' int64 list
  * encoded feature    'image/encoded' (JPEG/PNG -> PIL decode)
followed by center-crop/resize to the configured output size.
"""

from __future__ import annotations

import io
import os
import struct
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

Array = np.ndarray

_HEADER = struct.Struct("<QI")     # length (u64), masked crc32 of length (u32)
_FOOTER_LEN = 4                    # masked crc32 of data


def index_tfrecord(path: str) -> List[Tuple[int, int]]:
    """One pass over a TFRecord file -> [(payload_offset, length), ...]."""
    index = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + _HEADER.size <= size:
            header = f.read(_HEADER.size)
            if len(header) < _HEADER.size:
                break
            length, _ = _HEADER.unpack(header)
            payload_off = pos + _HEADER.size
            index.append((payload_off, length))
            pos = payload_off + length + _FOOTER_LEN
            f.seek(pos)
    return index


class TFRecordSource:
    """Deterministic random-access batches from TFRecord shards."""

    def __init__(self, root: str, output_size: int, crop: Optional[int] = None,
                 seed: int = 0, pattern: str = ".tfrecord"):
        self.files = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if pattern in f)
        if not self.files:
            raise FileNotFoundError(f"no TFRecord files under {root}")
        self.output_size = output_size
        self.crop = crop
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        # global record index: (file_id, offset, length)
        self._index: List[Tuple[int, int, int]] = []
        for fi, path in enumerate(self.files):
            for off, ln in index_tfrecord(path):
                self._index.append((fi, off, ln))
        if not self._index:
            raise ValueError(f"no records found under {root}")
        self._handles = [open(p, "rb") for p in self.files]
        # the trainer reads batches from a prefetch thread while scoring
        # reads from the main thread: seek+read on shared handles must
        # be serialized
        self._lock = threading.Lock()

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        return (self.output_size, self.output_size, 3)

    def __len__(self) -> int:
        return len(self._index)

    def _decode(self, payload: bytes) -> Array:
        from tensorflow.core.example import example_pb2  # proto only
        ex = example_pb2.Example.FromString(payload)
        feat = ex.features.feature
        img: Optional[Array] = None
        for key in ("image/encoded", "encoded"):
            if key in feat and feat[key].bytes_list.value:
                from PIL import Image
                raw = feat[key].bytes_list.value[0]
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                                 np.uint8)
                break
        if img is None:
            for key in ("image", "data", "image/raw"):
                if key in feat and feat[key].bytes_list.value:
                    buf = np.frombuffer(feat[key].bytes_list.value[0], np.uint8)
                    if "shape" in feat and feat["shape"].int64_list.value:
                        shape = tuple(feat["shape"].int64_list.value)
                    else:
                        side = int(round((buf.size / 3) ** 0.5))
                        shape = (side, side, 3)
                    img = buf.reshape(shape)
                    break
        if img is None:
            raise ValueError("record has no recognizable image feature "
                             f"(keys: {list(feat.keys())})")
        return self._crop_resize(img)

    def _crop_resize(self, img: Array) -> Array:
        h, w = img.shape[:2]
        c = self.crop or min(h, w)
        if (h, w) != (c, c):
            top, left = (h - c) // 2, (w - c) // 2
            img = img[top:top + c, left:left + c]
        if img.shape[0] != self.output_size:
            from PIL import Image
            img = np.asarray(
                Image.fromarray(img).resize((self.output_size,) * 2,
                                            Image.BILINEAR), np.uint8)
        return img

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        ids = rng.integers(0, len(self._index), size=n)
        out = np.empty((n, self.output_size, self.output_size, 3), np.float32)
        for i, rid in enumerate(ids):
            fi, off, ln = self._index[rid]
            fh = self._handles[fi]
            with self._lock:
                fh.seek(off)
                payload = fh.read(ln)
            out[i] = (self._decode(payload).astype(np.float32)
                      - 127.5) / 127.5
        return out
