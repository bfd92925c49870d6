"""SN-GAN-style residual architectures (SURVEY.md component #7,
core/resnet.py of the reference: pre-activation up/down residual
blocks, CIFAR-10 32x32 G/D and a deeper CelebA 160x160 variant with ~5
down blocks; global sum-pool + linear feature head).

Width/depth schedules are derived from ``output_size``:
  32  -> base 4, 3 blocks (CIFAR-10)
  64  -> base 4, 4 blocks (ImageNet 64)
  160 -> base 5, 5 blocks (CelebA)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from smmdax.nn.dcgan import _base_and_blocks
from smmdax.nn.layers import SNConv, SNDense, avg_pool_2x, upsample_nearest

Array = jnp.ndarray

_glorot = nn.initializers.glorot_uniform()


def _gen_widths(gf_dim: int, n_up: int) -> Sequence[int]:
    """Descending widths ending at gf_dim, e.g. n=5: 16,8,4,2,1 x gf."""
    return [gf_dim * (2 ** (n_up - 1 - i)) for i in range(n_up)]


def _disc_widths(df_dim: int, n_down: int) -> Sequence[int]:
    return [df_dim * (2 ** i) for i in range(n_down)]


class GenBlock(nn.Module):
    """Pre-activation residual up-block: BN-ReLU-up-conv-BN-ReLU-conv."""

    features: int
    upsample: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        h = nn.relu(h)
        if self.upsample:
            h = upsample_nearest(h)
        h = SNConv(self.features, (3, 3), kernel_init=_glorot,
                   dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = SNConv(self.features, (3, 3), kernel_init=_glorot,
                   dtype=self.dtype, name="conv2")(h)

        sc = upsample_nearest(x) if self.upsample else x
        if sc.shape[-1] != self.features:
            sc = SNConv(self.features, (1, 1), kernel_init=_glorot,
                        dtype=self.dtype, name="conv_sc")(sc)
        return h + sc


class DiscBlock(nn.Module):
    """Residual down-block: ReLU-conv-ReLU-conv-pool (+1x1 shortcut)."""

    features: int
    downsample: bool = True
    first: bool = False          # the 'optimized' input block (no leading ReLU)
    use_sn: bool = False
    sn_iters: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        sn = dict(use_sn=self.use_sn, sn_iters=self.sn_iters,
                  kernel_init=_glorot, dtype=self.dtype)
        h = x if self.first else nn.relu(x)
        h = SNConv(self.features, (3, 3), name="conv1", **sn)(h, update_sn=update_sn)
        h = nn.relu(h)
        h = SNConv(self.features, (3, 3), name="conv2", **sn)(h, update_sn=update_sn)
        if self.downsample:
            h = avg_pool_2x(h)

        sc = x
        if self.first:
            # optimized block: pool first, then widen
            if self.downsample:
                sc = avg_pool_2x(sc)
            sc = SNConv(self.features, (1, 1), name="conv_sc", **sn)(sc, update_sn=update_sn)
        else:
            if sc.shape[-1] != self.features:
                sc = SNConv(self.features, (1, 1), name="conv_sc", **sn)(sc, update_sn=update_sn)
            if self.downsample:
                sc = avg_pool_2x(sc)
        return h + sc


class ResNetGenerator(nn.Module):
    output_size: int = 32
    c_dim: int = 3
    gf_dim: int = 64
    z_dim: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        base, n_up = _base_and_blocks(self.output_size)
        # CIFAR-10 SN-GAN uses a flat 256-wide trunk; deeper variants taper.
        widths = ([4 * self.gf_dim] * n_up if n_up <= 3
                  else _gen_widths(self.gf_dim, n_up))
        x = SNDense(base * base * widths[0], kernel_init=_glorot,
                    dtype=self.dtype, name="project")(z)
        x = x.reshape(-1, base, base, widths[0])
        for i, w in enumerate(widths):
            x = GenBlock(w, dtype=self.dtype, name=f"block{i}")(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_out")(x)
        x = nn.relu(x)
        x = SNConv(self.c_dim, (3, 3), kernel_init=_glorot, dtype=self.dtype,
                   name="conv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))


class ResNetDiscriminator(nn.Module):
    output_size: int = 32
    df_dim: int = 64
    dof_dim: int = 16
    use_sn: bool = False
    sn_iters: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        base, n_down = _base_and_blocks(self.output_size)
        sn = dict(use_sn=self.use_sn, sn_iters=self.sn_iters, dtype=self.dtype)
        if n_down <= 3:
            # CIFAR-10 SN-GAN schedule: 128-wide, two extra no-down blocks
            w = 2 * self.df_dim
            x = DiscBlock(w, downsample=True, first=True, name="block0", **sn)(
                x, update_sn=update_sn)
            x = DiscBlock(w, downsample=True, name="block1", **sn)(x, update_sn=update_sn)
            x = DiscBlock(w, downsample=False, name="block2", **sn)(x, update_sn=update_sn)
            x = DiscBlock(w, downsample=False, name="block3", **sn)(x, update_sn=update_sn)
        else:
            widths = _disc_widths(self.df_dim, n_down)
            for i, w in enumerate(widths):
                x = DiscBlock(w, downsample=True, first=(i == 0),
                              name=f"block{i}", **sn)(x, update_sn=update_sn)
        x = nn.relu(x)
        x = jnp.sum(x.astype(jnp.float32), axis=(1, 2))   # global sum pool
        feats = SNDense(self.dof_dim, kernel_init=_glorot, name="head",
                        use_sn=self.use_sn, sn_iters=self.sn_iters)(
            x, update_sn=update_sn)
        return feats.astype(jnp.float32)     # MMD math is always f32
