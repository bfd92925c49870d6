"""Procedural data sources (offline stand-ins + the GaussianMix toy).

``GaussianMix`` reproduces the reference's 1-D toy problem (SURVEY.md
§3.5): samples from a mixture of 1-D Gaussians, used as the visual /
smoke-test dataset.  ``SyntheticImages`` produces image batches with
non-trivial low-dimensional structure (random smooth color blobs) so
that training dynamics — MMD decreasing, critic learning — are
exercised end-to-end without any downloadable asset.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

Array = np.ndarray


class GaussianMix:
    """1-D Gaussian mixture; samples shaped (B, dim) in roughly [-1, 1].

    Matches the toy in the reference lineage (means around {0, 3, 6, 9}
    scaled down; we use means in [-0.8, 0.8] so outputs sit in the tanh
    range of the generator).
    """

    def __init__(self, means: Sequence[float] = (-0.8, -0.3, 0.3, 0.8),
                 stddev: float = 0.07, dim: int = 1, seed: int = 0):
        self.means = np.asarray(means, np.float32)
        self.stddev = float(stddev)
        self.dim = dim
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        comp = rng.integers(0, len(self.means), size=n)
        x = self.means[comp][:, None] + self.stddev * rng.standard_normal(
            (n, self.dim)).astype(np.float32)
        return x.astype(np.float32)


class SyntheticImages:
    """Procedural image distribution: K random smooth blob prototypes
    plus per-sample color jitter and spatial shift, normalized to
    [-1, 1].  Cheap to sample, impossible to memorize trivially, and
    shape-compatible with any of the real datasets."""

    def __init__(self, size: int = 32, channels: int = 3,
                 num_prototypes: int = 64, seed: int = 0):
        self.size = size
        self.channels = channels
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        # Prototype library: sums of random 2-D Gaussian bumps.
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        protos = np.zeros((num_prototypes, size, size, channels), np.float32)
        for p in range(num_prototypes):
            img = np.zeros((size, size, channels), np.float32)
            for _ in range(self._rng.integers(2, 6)):
                cx, cy = self._rng.uniform(0.15, 0.85, 2)
                s = self._rng.uniform(0.05, 0.3)
                bump = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
                color = self._rng.uniform(-1, 1, channels).astype(np.float32)
                img += bump[..., None] * color
            m = np.abs(img).max() + 1e-6
            protos[p] = img / m
        self.protos = protos

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        return (self.size, self.size, self.channels)

    def _draw(self, n: int, key: Optional[int]):
        """One combined prototype+shift gather plus the per-sample
        jitter coefficients.  The host pipeline must stay well under the
        ~21 ms device macro-step (profiled round 2), so everything is a
        single fancy-gather and one fused multiply-add pass — the
        per-sample jitter commutes with the circular shift, which lets
        the shift fold INTO the prototype gather instead of being a
        second full-batch pass."""
        rng = self._rng if key is None else np.random.default_rng(
            (self.seed, key))
        idx = rng.integers(0, len(self.protos), size=n)
        gain = rng.uniform(0.7, 1.0, (n, 1, 1, 1)).astype(np.float32)
        bias = rng.uniform(-0.1, 0.1, (n, 1, 1, 1)).astype(np.float32)
        shifts = rng.integers(-4, 5, size=(n, 2))
        ar = np.arange(self.size)
        row_idx = (ar[None, :] - shifts[:, 0:1]) % self.size     # (n, h)
        col_idx = (ar[None, :] - shifts[:, 1:2]) % self.size     # (n, w)
        imgs = self.protos[idx[:, None, None],
                           row_idx[:, :, None], col_idx[:, None, :]]
        return imgs, gain, bias

    def batch(self, n: int, key: Optional[int] = None) -> Array:
        imgs, gain, bias = self._draw(n, key)
        return np.clip(imgs * gain + bias, -1.0, 1.0)

    def batch_u8(self, n: int, key: Optional[int] = None) -> Array:
        """Exactly ``round((batch(n, key) + 1) * 127.5)`` as uint8, in
        one fused pass (rint is monotone, so quantize-then-clip equals
        clip-then-quantize): the uint8_transfer fast path without ever
        materializing the float [-1, 1] batch."""
        imgs, gain, bias = self._draw(n, key)
        out = np.rint(imgs * (gain * 127.5) + (bias + 1.0) * 127.5)
        np.clip(out, 0.0, 255.0, out=out)
        return out.astype(np.uint8)
