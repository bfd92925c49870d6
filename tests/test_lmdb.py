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


def test_reader_decodes_hand_authored_golden(tmp_path):
    """LMDBReader vs an independently hand-packed data.mdb: the bytes
    are assembled HERE from the public LMDB struct layout (MDB_page /
    MDB_node / MDB_meta in OpenLDAP's lmdb.h/mdb.c), deliberately NOT
    via smmdax's write_lmdb, so a shared reader/writer misreading of
    the real format cannot pass (ADVICE r2).  Layout (psize 4096,
    64-bit little-endian):

      page 0: meta, txnid 0        page 1: meta, txnid 1 (committed)
      page 2: overflow (1 page) holding the 2000-byte value of "big"
      page 3: leaf root with 3 sorted keys: alpha, big(F_BIGDATA), zeta
    """
    import struct
    psize = 4096
    alpha_v = b"the-first-value"
    big_v = bytes((i * 7 + 3) % 256 for i in range(2000))   # overflow value
    zeta_v = b"last"

    # --- page 2: overflow page for "big" -------------------------------
    # MDB_page header: mp_pgno(u64) mp_pad(u16) mp_flags(u16=P_OVERFLOW
    # 0x04) then for overflow pages the lower/upper union is mp_pages(u32)
    pg2 = bytearray(psize)
    struct.pack_into("<QHHI", pg2, 0, 2, 0, 0x04, 1)
    pg2[16:16 + len(big_v)] = big_v

    # --- page 3: leaf root ---------------------------------------------
    # MDB_node: mn_lo(u16) mn_hi(u16) mn_flags(u16) mn_ksize(u16) + key
    # + data; leaf datasize = lo | hi<<16; F_BIGDATA (0x01) stores the
    # overflow pgno (u64) as the data payload.  Node offsets are u16
    # pointers from the page start, stored ascending by key; node bodies
    # grow down from mp_upper.  mdb.c pads each node to even size.
    def leaf_node(key: bytes, flags: int, data: bytes) -> bytes:
        dsize = len(data)
        raw = struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags,
                          len(key)) + key + data
        # NODESIZE alignment: mdb.c rounds node sizes up to even
        return raw + (b"\x00" if len(raw) & 1 else b"")

    n_alpha = leaf_node(b"alpha", 0, alpha_v)
    # F_BIGDATA: mn_lo/hi still hold the FULL value size; payload = pgno
    n_big_payload = struct.pack("<Q", 2)
    n_big = struct.pack("<HHHH", len(big_v) & 0xFFFF, len(big_v) >> 16,
                        0x01, 3) + b"big" + n_big_payload
    n_zeta = leaf_node(b"zeta", 0, zeta_v)

    pg3 = bytearray(psize)
    upper = psize
    ptrs = []
    for node in (n_alpha, n_big, n_zeta):   # already key-sorted
        upper -= len(node)
        ptrs.append(upper)
        pg3[upper:upper + len(node)] = node
    lower = 16 + 2 * 3
    struct.pack_into("<QHHHH", pg3, 0, 3, 0, 0x02, lower, upper)  # P_LEAF
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", pg3, 16 + 2 * i, p)

    # --- meta pages ----------------------------------------------------
    # MDB_meta after the 16-byte page header: mm_magic(u32 0xBEEFC0DE)
    # mm_version(u32 1) mm_address(ptr u64) mm_mapsize(u64)
    # mm_dbs[2] (MDB_db: md_pad u32, md_flags u16, md_depth u16,
    #   md_branch_pages u64, md_leaf_pages u64, md_overflow_pages u64,
    #   md_entries u64, md_root u64)  [mm_psize == mm_dbs[0].md_pad]
    # mm_last_pg(u64) mm_txnid(u64)
    def meta(pgno: int, txnid: int) -> bytes:
        buf = bytearray(psize)
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, 0x08, 0, 0)  # P_META
        o = 16
        struct.pack_into("<IIQQ", buf, o, 0xBEEFC0DE, 1, 0, 1024 * psize)
        o += 24
        P_INVALID = 0xFFFFFFFFFFFFFFFF
        struct.pack_into("<IHHQQQQQ", buf, o,      # FREE_DBI
                         psize, 0, 0, 0, 0, 0, 0, P_INVALID)
        o += 48
        if txnid == 0:                             # pre-commit: empty main
            struct.pack_into("<IHHQQQQQ", buf, o, 0, 0, 0, 0, 0, 0, 0,
                             P_INVALID)
        else:                                      # MAIN_DBI, committed
            struct.pack_into("<IHHQQQQQ", buf, o, 0, 0, 1, 0, 1, 1, 3, 3)
        o += 48
        struct.pack_into("<QQ", buf, o, 3, txnid)  # mm_last_pg, mm_txnid
        return bytes(buf)

    env = tmp_path / "golden"
    env.mkdir()
    (env / "data.mdb").write_bytes(meta(0, 0) + meta(1, 1)
                                   + bytes(pg2) + bytes(pg3))

    r = LMDBReader(str(env))
    assert len(r) == 3
    assert [r.key(i) for i in range(3)] == [b"alpha", b"big", b"zeta"]
    assert r.value(0) == alpha_v
    assert r.value(1) == big_v
    assert r.value(2) == zeta_v
    r.close()


def test_lsun_category_selection(tmp_path):
    """Multiple LSUN environments: explicit --lsun_category picks the
    scene; no category with several environments is an error, not an
    arbitrary alphabetical pick (ADVICE r2)."""
    from smmdax.data.pipeline import _find_lsun_lmdb
    root = os.path.join(str(tmp_path), "lsun")
    for env in ("bedroom_train_lmdb", "bridge_train_lmdb"):
        write_lmdb(os.path.join(root, env), [(b"k", b"v")])
    with pytest.raises(ValueError, match="lsun_category"):
        _find_lsun_lmdb(root)
    assert _find_lsun_lmdb(root, "bridge_train").endswith("bridge_train_lmdb")
    assert _find_lsun_lmdb(
        root, "bedroom_train_lmdb").endswith("bedroom_train_lmdb")
    with pytest.raises(FileNotFoundError, match="tower"):
        _find_lsun_lmdb(root, "tower_train")
    # single environment: still auto-selected without a category
    solo = os.path.join(str(tmp_path), "solo", "lsun")
    write_lmdb(os.path.join(solo, "kitchen_train_lmdb"), [(b"k", b"v")])
    assert _find_lsun_lmdb(solo).endswith("kitchen_train_lmdb")


def test_packed_cache_respects_lsun_category(tmp_path):
    """A category-less packed cache must NOT serve an explicit
    --lsun_category request (it records no scene provenance); the
    per-scene cache path does (review finding r3)."""
    import shutil

    from smmdax.data.convert import pack_lsun, packed_path
    from smmdax.data.pipeline import ArraySource

    _write_lsun_fixture(str(tmp_path))
    env = os.path.join(str(tmp_path), "lsun", "bedroom_train_lmdb")
    generic = packed_path(str(tmp_path), "lsun", 64)
    pack_lsun(env, generic, size=64, log_every=0)

    # category-less request: generic cache serves it (existing behavior)
    cfg = Config(dataset="lsun", output_size=64, data_dir=str(tmp_path))
    assert isinstance(make_dataset(cfg), ArraySource)

    # explicit category: the generic cache is skipped; falls back to
    # the live LMDB for the requested scene
    cfg_cat = cfg.replace(lsun_category="bedroom_train")
    src = make_dataset(cfg_cat)
    assert isinstance(src, LSUNSource)

    # the per-scene cache is honored once it exists
    per_scene = packed_path(str(tmp_path), "lsun", 64,
                            category="bedroom_train")
    shutil.copy(generic, per_scene)
    assert isinstance(make_dataset(cfg_cat), ArraySource)


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
