"""Asset-gated real-dataset loaders, exercised against fixture files in
the exact on-disk formats (CIFAR-10 pickles, ImageNet64 npz shards,
MNIST idx, CelebA jpeg dir)."""

import os
import pickle
import struct

import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.data.pipeline import make_dataset


def _write_cifar10(data_dir):
    root = os.path.join(data_dir, "cifar-10-batches-py")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        flat = rng.integers(0, 256, (20, 3 * 32 * 32), dtype=np.uint8)
        with open(os.path.join(root, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": flat, b"labels": [0] * 20}, f)


def test_cifar10_loader(tmp_path):
    _write_cifar10(str(tmp_path))
    cfg = Config(dataset="cifar10", data_dir=str(tmp_path))
    src = make_dataset(cfg)
    assert src.sample_shape == (32, 32, 3)
    b = src.batch(16, key=3)
    assert b.shape == (16, 32, 32, 3) and b.dtype == np.float32
    assert b.min() >= -1.0 and b.max() <= 1.0
    np.testing.assert_array_equal(b, src.batch(16, key=3))  # keyed determinism


def test_imagenet64_npz_loader(tmp_path):
    root = tmp_path / "imagenet64"
    root.mkdir()
    rng = np.random.default_rng(1)
    # flattened-CHW layout (the Chrabaszcz et al. downsampled-ImageNet format)
    np.savez(root / "train_data_batch_1.npz",
             data=rng.integers(0, 256, (30, 3 * 64 * 64), dtype=np.uint8))
    cfg = Config(dataset="imagenet64", output_size=64, data_dir=str(tmp_path))
    src = make_dataset(cfg)
    b = src.batch(8, key=0)
    assert b.shape == (8, 64, 64, 3)
    assert b.min() >= -1.0 and b.max() <= 1.0


def test_mnist_idx_loader(tmp_path):
    root = tmp_path / "mnist"
    root.mkdir()
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (25, 28, 28), dtype=np.uint8)
    with open(root / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 25, 28, 28))
        f.write(imgs.tobytes())
    cfg = Config(dataset="mnist", output_size=28, c_dim=1,
                 data_dir=str(tmp_path))
    src = make_dataset(cfg)
    b = src.batch(4, key=1)
    assert b.shape == (4, 28, 28, 1)


def test_celeba_jpeg_loader(tmp_path):
    from PIL import Image
    root = tmp_path / "celeba"
    root.mkdir()
    rng = np.random.default_rng(3)
    for i in range(6):
        arr = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{i:06d}.jpg")
    cfg = Config(dataset="celeba", output_size=160, data_dir=str(tmp_path))
    src = make_dataset(cfg)
    assert src.sample_shape == (160, 160, 3)
    b = src.batch(4, key=0)
    assert b.shape == (4, 160, 160, 3)
    assert b.min() >= -1.0 and b.max() <= 1.0


def test_missing_assets_fall_back_to_synthetic(tmp_path):
    cfg = Config(dataset="cifar10", data_dir=str(tmp_path / "nothing"))
    src = make_dataset(cfg)
    assert src.batch(4, key=0).shape == (4, 32, 32, 3)  # synthetic substitute


def test_center_crop_clamps_to_image(tmp_path):
    """crop larger than the image must clamp to the shortest side —
    PIL pads out-of-bounds crop boxes with black, which would silently
    corrupt every sample from a small-image directory."""
    from PIL import Image

    from smmdax.data.pipeline import center_crop_resize

    img = Image.fromarray(np.full((128, 128, 3), 200, np.uint8))
    out = np.asarray(center_crop_resize(img, 64, crop=160))
    assert out.shape == (64, 64, 3)
    assert out.min() == 200                  # no black padding anywhere


def test_array_source_flip_applies_on_every_path():
    """flip=True must actually flip on the float batch(), the uint8
    batch_u8() and the float-quantize batch_u8() paths (it silently
    no-opped on the float paths)."""
    from smmdax.data.pipeline import ArraySource

    base = np.zeros((4, 8, 8, 3), np.float32)
    base[:, :, 0, :] = 1.0                   # left column lit
    src = ArraySource(base, seed=0, flip=True)
    b = np.asarray(src.batch(64, key=1))
    # with 64 draws, both orientations must appear
    left = (b[:, :, 0, :] > 0.5).all(axis=(1, 2))
    right = (b[:, :, -1, :] > 0.5).all(axis=(1, 2))
    assert left.any() and right.any()
    u = src.batch_u8(64, key=1)
    lu = (u[:, :, 0, :] > 128).all(axis=(1, 2))
    ru = (u[:, :, -1, :] > 128).all(axis=(1, 2))
    assert lu.any() and ru.any()


def test_materialize_u8_refuses_flip():
    """data_placement=device gathers batches in-program with no host
    transform hook — a flip-requesting source must fail loudly, not
    silently drop the augmentation."""
    import pytest

    from smmdax.data.pipeline import ArraySource, materialize_u8

    src = ArraySource(np.zeros((4, 8, 8, 3), np.uint8), flip=True)
    with pytest.raises(ValueError, match="flip"):
        materialize_u8(src)


def test_lsun_loose_jpeg_fallback_uses_shortest_side_crop(tmp_path):
    """The LSUN loose-JPEG fallback must crop the full shortest side
    like the LMDB/TFRecord/packed LSUN paths, not CelebA's 160."""
    from PIL import Image

    from smmdax.configs import Config
    from smmdax.data import make_dataset

    root = tmp_path / "lsun"
    root.mkdir()
    # 256x256 with a bright frame at the 200px border: a 160-crop
    # would cut the frame off, a shortest-side (256) crop keeps it
    arr = np.zeros((256, 256, 3), np.uint8)
    arr[28, :, :] = 255
    for i in range(3):
        Image.fromarray(arr).save(root / f"im{i}.webp.jpg")
    cfg = Config(dataset="lsun", data_dir=str(tmp_path), output_size=64,
                 batch_size=2)
    src = make_dataset(cfg)
    b = np.asarray(src.batch(2, key=0))
    assert b.shape == (2, 64, 64, 3)
    # the frame survived the crop (smeared by the 4x downsample but
    # present; a CelebA-style 160 crop would cut it: max == -1 exactly)
    assert b.max() > -0.9


def test_make_assets_tool_roundtrips_every_format(tmp_path):
    """tools/make_assets.py (the dress-rehearsal asset synthesizer)
    writes byte-format-exact stand-ins that every real loader reads
    back — the same tool that built the production-volume assets for
    the round-4 per-format throughput rows in BASELINE.md."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_assets

    out = str(tmp_path)
    make_assets.main(["--out", out, "--cifar_n", "50", "--celeba_n", "6",
                      "--lsun_n", "8", "--imagenet_n", "20",
                      "--mnist_n", "10"])

    for ds, size, kw, n_expect in [
            ("cifar10", 32, {}, 50),
            ("celeba", 160, {}, None),
            ("lsun", 64, {"lsun_category": "bedroom_train"}, None),
            ("imagenet64", 64, {}, 20),
            ("mnist", 28, {"c_dim": 1}, 10)]:
        cfg = Config(dataset=ds, output_size=size, data_dir=out, **kw)
        src = make_dataset(cfg)
        assert type(src).__name__ != "SyntheticImages", ds
        b = src.batch(4, key=0)
        c = 1 if ds == "mnist" else 3
        assert b.shape == (4, size, size, c), ds
        assert b.min() >= -1.0 and b.max() <= 1.0, ds
        data = getattr(src, "data", None)
        if n_expect is not None and data is not None:
            assert len(data) == n_expect, ds
