"""Small MLP G/D for the 1-D GaussianMix toy (SURVEY.md §3.5 — the
reference's visual smoke test trains the same MMD losses on a 1-D
Gaussian mixture)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from smmdax.nn.layers import SNDense, lrelu

Array = jnp.ndarray


class MLPGenerator(nn.Module):
    out_dim: int = 1
    hidden: Tuple[int, ...] = (64, 64)
    z_dim: int = 16

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        x = z
        for i, h in enumerate(self.hidden):
            x = nn.relu(SNDense(h, name=f"fc{i}")(x))
        return jnp.tanh(SNDense(self.out_dim, name="out")(x))


class MLPDiscriminator(nn.Module):
    dof_dim: int = 8
    hidden: Tuple[int, ...] = (64, 64)
    use_sn: bool = False
    sn_iters: int = 1

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        x = x.reshape(x.shape[0], -1)
        for i, h in enumerate(self.hidden):
            x = lrelu(SNDense(h, use_sn=self.use_sn, sn_iters=self.sn_iters,
                              name=f"fc{i}")(x, update_sn=update_sn))
        return SNDense(self.dof_dim, use_sn=self.use_sn,
                       sn_iters=self.sn_iters, name="head")(
                           x, update_sn=update_sn)
