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
