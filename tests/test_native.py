"""Native C++ batch-assembly ops vs the numpy fallback."""

import numpy as np
import pytest

from smmdax.data import native
from smmdax.data.pipeline import ArraySource


def _numpy_ref(data, idx, flips=None):
    out = (data[idx].astype(np.float32) - 127.5) / 127.5
    if flips is not None:
        m = flips.astype(bool)
        out[m] = out[m][:, :, ::-1, :]
    return out


def test_native_builds_and_matches():
    lib = native._load()
    if lib is None:
        pytest.skip("no g++ available")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (200, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, size=77)
    got = native.gather_normalize(data, idx)
    np.testing.assert_allclose(got, _numpy_ref(data, idx), atol=1e-6)


def test_native_flip_matches():
    lib = native._load()
    if lib is None:
        pytest.skip("no g++ available")
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (50, 6, 5, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, size=128)
    flips = rng.integers(0, 2, size=128).astype(np.uint8)
    got = native.gather_normalize(data, idx, flips)
    np.testing.assert_allclose(got, _numpy_ref(data, idx, flips), atol=1e-6)


def test_native_flat_samples():
    lib = native._load()
    if lib is None:
        pytest.skip("no g++ available")
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, (100, 784), dtype=np.uint8)
    idx = rng.integers(0, 100, size=32)
    got = native.gather_normalize(data, idx)
    np.testing.assert_allclose(got, _numpy_ref(data, idx), atol=1e-6)


def test_array_source_uint8_deterministic():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (64, 4, 4, 3), dtype=np.uint8)
    src = ArraySource(data, seed=0)
    a = src.batch(16, key=5)
    b = src.batch(16, key=5)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32
    assert a.min() >= -1.0 and a.max() <= 1.0
