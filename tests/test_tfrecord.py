"""TFRecord loader: write real TFRecord files with TF, read them back
with our offset-index random-access loader."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from smmdax.data.tfrecord import TFRecordSource, index_tfrecord


def _write_raw_records(path, images):
    with tf.io.TFRecordWriter(path) as w:
        for img in images:
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[img.tobytes()])),
                "shape": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=list(img.shape))),
            }))
            w.write(ex.SerializeToString())


def _write_png_records(path, images):
    with tf.io.TFRecordWriter(path) as w:
        for img in images:
            enc = tf.io.encode_png(img).numpy()
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[enc])),
            }))
            w.write(ex.SerializeToString())


def test_index_and_raw_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (10, 32, 32, 3), dtype=np.uint8)
    path = os.path.join(tmp_path, "a.tfrecord")
    _write_raw_records(path, imgs)
    assert len(index_tfrecord(path)) == 10

    src = TFRecordSource(str(tmp_path), output_size=32)
    assert len(src) == 10
    batch = src.batch(4, key=1)
    assert batch.shape == (4, 32, 32, 3)
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    # determinism
    np.testing.assert_array_equal(batch, src.batch(4, key=1))
    # exact roundtrip: find which source image each decoded one matches
    ids = np.random.default_rng((0, 1)).integers(0, 10, size=4)
    want = (imgs[ids].astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(batch, want, atol=1e-6)


def test_encoded_records_with_crop_resize(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (6, 48, 40, 3), dtype=np.uint8)
    _write_png_records(os.path.join(tmp_path, "b.tfrecord"), imgs)
    src = TFRecordSource(str(tmp_path), output_size=32)
    batch = src.batch(3, key=0)
    assert batch.shape == (3, 32, 32, 3)
    assert np.isfinite(batch).all()


def test_multi_shard(tmp_path):
    rng = np.random.default_rng(2)
    for s in range(3):
        imgs = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
        _write_raw_records(os.path.join(tmp_path, f"s{s}.tfrecord"), imgs)
    src = TFRecordSource(str(tmp_path), output_size=16)
    assert len(src) == 15
    assert src.batch(8, key=3).shape == (8, 16, 16, 3)
