"""On-device fused image transforms (SPEC: "the image input pipeline
(decode, resize/crop, normalize ...) runs as on-device fused
transforms").

The host pipeline ships raw uint8 batches; everything after that —
dtype conversion, [-1,1] normalization, center/random crop, 2^k
down-resize, horizontal flips — is one jitted function that XLA fuses
into a single pass over the batch (HBM-bandwidth bound, no host work).
Random ops take an explicit PRNG key (stateless, shard-safe).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def normalize_uint8(x: Array) -> Array:
    """uint8 [0,255] -> float32 [-1, 1] (exact at both endpoints:
    (x - 127.5)/127.5 divides identical operands, so 255 -> 1.0)."""
    return (x.astype(jnp.float32) - 127.5) / 127.5


def center_crop(x: Array, crop: int) -> Array:
    """(B, H, W, C) -> (B, crop, crop, C) center crop (static shapes)."""
    h, w = x.shape[1], x.shape[2]
    top, left = (h - crop) // 2, (w - crop) // 2
    return x[:, top:top + crop, left:left + crop, :]


def resize_down_pow2(x: Array, out_size: int) -> Array:
    """Antialiased power-of-two downsize by mean pooling (the cheap,
    MXU/VPU-friendly resize for 2^k ratios; e.g. CelebA 160 -> 80)."""
    h = x.shape[1]
    factor = h // out_size
    if factor * out_size != h or factor & (factor - 1):
        raise ValueError(f"resize_down_pow2 needs H == out*2^k, got {h}->{out_size}")
    while x.shape[1] > out_size:
        b, hh, ww, c = x.shape
        x = x.reshape(b, hh // 2, 2, ww // 2, 2, c).mean(axis=(2, 4))
    return x


def resize_bilinear(x: Array, out_size: int) -> Array:
    """General bilinear resize (jax.image, lowers to gathers — prefer
    the pow2 mean-pool path when the ratio allows)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_size, out_size, c), method="bilinear")


def random_flip(x: Array, key: jax.Array) -> Array:
    """Per-sample horizontal flip (branchless: select between x and its
    mirror — no dynamic shapes)."""
    flips = jax.random.bernoulli(key, 0.5, (x.shape[0], 1, 1, 1))
    return jnp.where(flips, x[:, :, ::-1, :], x)


def random_crop(x: Array, crop: int, key: jax.Array) -> Array:
    """Per-sample random crop via one dynamic_slice per sample (vmap)."""
    h, w = x.shape[1], x.shape[2]
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (x.shape[0],), 0, h - crop + 1)
    lefts = jax.random.randint(kl, (x.shape[0],), 0, w - crop + 1)

    def one(img, t, l):
        return jax.lax.dynamic_slice(img, (t, l, 0), (crop, crop, img.shape[-1]))

    return jax.vmap(one)(x, tops, lefts)


@partial(jax.jit, static_argnames=("crop", "out_size", "flip"))
def standard_pipeline(raw_uint8: Array, key: jax.Array, *,
                      crop: Optional[int] = None,
                      out_size: Optional[int] = None,
                      flip: bool = False) -> Array:
    """The fused decode-side pipeline: normalize -> [crop] -> [resize]
    -> [flip].  One compiled program; XLA fuses it into a single
    HBM pass."""
    x = normalize_uint8(raw_uint8)
    if crop is not None and crop != x.shape[1]:
        x = center_crop(x, crop)
    if out_size is not None and out_size != x.shape[1]:
        h = x.shape[1]
        if h % out_size == 0 and ((h // out_size) & (h // out_size - 1)) == 0:
            x = resize_down_pow2(x, out_size)
        else:
            x = resize_bilinear(x, out_size)
    if flip:
        x = random_flip(x, key)
    return x
