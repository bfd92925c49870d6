"""DCGAN generator/critic (SURVEY.md component #6, core/architecture.py).

Shape scheme of the reference lineage: the generator projects z to a
4x4 base grid and doubles resolution with stride-2 deconvs (BN+ReLU,
tanh output); the critic mirrors it with stride-2 convs + lrelu(0.2)
and ends in a linear map to a ``dof_dim``-dimensional FEATURE (not a
scalar) — the MMD loss acts on critic features.  The number of
up/down blocks is derived from ``output_size`` (32 -> 3, 64 -> 4,
160 -> 5 with a 5x5 base), covering the reference's dcgan/dcgan5/64px
variants with one parametric module.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from smmdax.nn.layers import (ConvTranspose, SNConv, SNDense,
                              default_kernel_init, lrelu)

Array = jnp.ndarray


def _base_and_blocks(output_size: int) -> Tuple[int, int]:
    """(base grid size, #stride-2 blocks) with base in {4, 5}."""
    for base in (4, 5, 3, 6, 7):
        n = output_size / base
        k = int(round(math.log2(n))) if n > 1 else 0
        if base * (2 ** k) == output_size and k >= 1:
            return base, k
    raise ValueError(f"output_size {output_size} not reachable from a 3..7 base grid")


class DCGANGenerator(nn.Module):
    output_size: int = 32
    c_dim: int = 3
    gf_dim: int = 64
    z_dim: int = 128
    use_bn: bool = True
    dtype: Optional[Any] = None       # bfloat16 compute; params stay f32

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        base, n_up = _base_and_blocks(self.output_size)
        width = self.gf_dim * (2 ** (n_up - 1))

        x = SNDense(base * base * width, kernel_init=default_kernel_init,
                    dtype=self.dtype, name="project")(z)
        x = x.reshape(-1, base, base, width)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name="bn_in")(x)
        x = nn.relu(x)

        for i in range(n_up - 1):
            width //= 2
            x = ConvTranspose(width, dtype=self.dtype, name=f"deconv{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)

        x = ConvTranspose(self.c_dim, dtype=self.dtype, name="deconv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))


class DCGANDiscriminator(nn.Module):
    """Critic: stride-2 conv stack -> dof_dim feature head.

    ``use_sn`` spectrally normalizes every weight (the 'sn-smmd'
    configuration); ``update_sn`` gates the once-per-step power
    iteration (pass True on exactly one application per optimizer
    step).
    """

    output_size: int = 32
    df_dim: int = 64
    dof_dim: int = 16
    use_sn: bool = False
    sn_iters: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        base, n_down = _base_and_blocks(self.output_size)
        width = self.df_dim
        for i in range(n_down):
            x = SNConv(width, kernel_size=(4, 4), strides=(2, 2),
                       use_sn=self.use_sn, sn_iters=self.sn_iters,
                       dtype=self.dtype, name=f"conv{i}")(x, update_sn=update_sn)
            x = lrelu(x)
            width *= 2
        x = x.reshape(x.shape[0], -1)
        feats = SNDense(self.dof_dim, use_sn=self.use_sn, sn_iters=self.sn_iters,
                        dtype=self.dtype, name="head")(x, update_sn=update_sn)
        return feats.astype(jnp.float32)   # MMD math is always f32
