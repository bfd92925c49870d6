"""LMDB store (smmdax/data/lmdb_store.py) + LSUN loader (VERDICT item 8).

The ``lmdb`` C library is absent here, so both the reader and the
fixture writer implement the public LMDB on-disk format; the tests
exercise the format surface the LSUN archives use: multi-leaf B+trees
with a branch root, overflow (F_BIGDATA) value chains, meta-page
selection by txnid, and webp-encoded image values.
"""

import io
import os

import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.data.lmdb_store import LMDBFormatError, LMDBReader, write_lmdb
from smmdax.data.pipeline import LSUNSource, make_dataset


def test_roundtrip_single_leaf(tmp_path):
    items = {b"b": b"beta", b"a": b"alpha", b"c": b"\x00" * 100}
    write_lmdb(str(tmp_path / "env"), items.items())
    r = LMDBReader(str(tmp_path / "env"))
    assert len(r) == 3
    assert [r.key(i) for i in range(3)] == [b"a", b"b", b"c"]  # sorted
    assert dict(r.items()) == items
    r.close()


def test_roundtrip_multi_leaf_with_branch_root(tmp_path):
    # enough entries that one 4096-byte leaf cannot hold them
    rng = np.random.default_rng(0)
    items = {f"key{i:05d}".encode(): rng.bytes(200) for i in range(64)}
    write_lmdb(str(tmp_path / "env"), items.items())
    r = LMDBReader(str(tmp_path / "env"))
    assert len(r) == 64
    assert dict(r.items()) == items
    # keys come back in global sorted order across leaves
    keys = [r.key(i) for i in range(len(r))]
    assert keys == sorted(keys)
    r.close()


def test_roundtrip_overflow_values(tmp_path):
    rng = np.random.default_rng(1)
    big1 = rng.bytes(10_000)          # multi-page overflow chain
    big2 = rng.bytes(4097)
    items = {b"big1": big1, b"big2": big2, b"small": b"x"}
    write_lmdb(str(tmp_path / "env"), items.items())
    r = LMDBReader(str(tmp_path / "env"))
    assert dict(r.items()) == items
    r.close()


def test_reader_accepts_data_file_path(tmp_path):
    write_lmdb(str(tmp_path / "env"), [(b"k", b"v")])
    r = LMDBReader(str(tmp_path / "env" / "data.mdb"))
    assert r.value(0) == b"v"
    r.close()


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "data.mdb").write_bytes(os.urandom(16384))
    with pytest.raises(LMDBFormatError):
        LMDBReader(str(p))


def _write_lsun_fixture(data_dir: str, n: int = 6, size: int = 96) -> dict:
    """LSUN layout: data_dir/lsun/bedroom_train_lmdb/data.mdb with
    webp-encoded images (the official archive encoding)."""
    from PIL import Image
    rng = np.random.default_rng(7)
    items = {}
    for i in range(n):
        # non-square, so the loader's shortest-side center crop runs
        arr = rng.integers(0, 256, (size, size + 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="WEBP", lossless=True)
        items[f"img{i:04d}".encode()] = buf.getvalue()
    env = os.path.join(data_dir, "lsun", "bedroom_train_lmdb")
    write_lmdb(env, items.items())
    return items


def test_lsun_lmdb_loader_end_to_end(tmp_path):
    _write_lsun_fixture(str(tmp_path))
    cfg = Config(dataset="lsun", output_size=64, data_dir=str(tmp_path))
    src = make_dataset(cfg)
    assert isinstance(src, LSUNSource)      # NOT the CelebA/synthetic fallback
    assert src.sample_shape == (64, 64, 3)
    b = src.batch(8, key=5)
    assert b.shape == (8, 64, 64, 3) and b.dtype == np.float32
    assert b.min() >= -1.0 and b.max() <= 1.0
    np.testing.assert_array_equal(b, src.batch(8, key=5))  # keyed determinism
    assert not np.array_equal(b, src.batch(8, key=6))


def test_lsun_decode_is_exact_at_native_size(tmp_path):
    """Lossless webp + no resize needed -> the loader returns the exact
    pixels (validates decode + crop arithmetic, not just shapes)."""
    from PIL import Image
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="WEBP", lossless=True)
    env = os.path.join(str(tmp_path), "lsun", "x_lmdb")
    write_lmdb(env, [(b"only", buf.getvalue())])
    src = LSUNSource(env, output_size=64)
    out = src.batch(2, key=0)
    expected = arr.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out[0], expected, atol=1e-6)
    np.testing.assert_allclose(out[1], expected, atol=1e-6)


def test_pack_lsun_and_packed_pickup(tmp_path):
    """Decode-once conversion (smmdax/data/convert.py): packed uint8
    equals the live LSUN decode, and make_dataset prefers the packed
    memmap (ArraySource -> C++ gather + uint8-transfer fast paths)."""
    from smmdax.data.convert import load_packed, pack_lsun, packed_path
    from smmdax.data.pipeline import ArraySource

    _write_lsun_fixture(str(tmp_path))
    env = os.path.join(str(tmp_path), "lsun", "bedroom_train_lmdb")
    out = packed_path(str(tmp_path), "lsun", 64)
    pack_lsun(env, out, size=64, log_every=0)

    packed = load_packed(out)
    assert packed.shape[1:] == (64, 64, 3) and packed.dtype == np.uint8
    live = LSUNSource(env, output_size=64)
    for i in range(len(packed)):
        np.testing.assert_array_equal(packed[i], live.decode_u8(i))

    cfg = Config(dataset="lsun", output_size=64, data_dir=str(tmp_path))
    src = make_dataset(cfg)
    assert isinstance(src, ArraySource)
    b = src.batch(4, key=1)
    assert b.shape == (4, 64, 64, 3) and b.dtype == np.float32
    u8 = src.batch_u8(4, key=1)
    assert u8.dtype == np.uint8 and u8.shape == (4, 64, 64, 3)


def test_pack_image_dir(tmp_path):
    from PIL import Image

    from smmdax.data.convert import pack_image_dir
    rng = np.random.default_rng(3)
    root = tmp_path / "imgs"
    root.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (70, 60, 3), dtype=np.uint8)
                        ).save(root / f"{i}.png")
    out = str(tmp_path / "packed.npy")
    pack_image_dir(str(root), out, size=32, log_every=0)
    arr = np.load(out)
    assert arr.shape == (4, 32, 32, 3) and arr.dtype == np.uint8


def test_roundtrip_deep_branch_tree(tmp_path):
    """Multiple branch LEVELS (small psize forces ~24 entries/leaf and
    ~27 refs/branch): LSUN-scale trees are deeper than one branch page."""
    items = {f"k{i:06d}".encode(): bytes([i % 256]) * 3 for i in range(2000)}
    write_lmdb(str(tmp_path / "env"), items.items(), psize=512)
    r = LMDBReader(str(tmp_path / "env"))
    assert len(r) == 2000
    assert dict(r.items()) == items
    keys = [r.key(i) for i in range(len(r))]
    assert keys == sorted(keys)
    r.close()
