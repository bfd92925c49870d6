"""Low-level layers: spectrally-normalized dense/conv + helpers.

TPU-native re-design of the reference's ``core/ops.py`` (SURVEY.md
component #8: linear / conv2d / deconv2d / lrelu / batch_norm +
``spectral_normed_weight`` power iteration).  Differences from the TF1
original, by design:

* The power-iteration vector ``u`` lives in a flax variable collection
  ``'spectral'`` — explicit state threaded through the jitted train
  step (the reference used a persistent TF variable updated through an
  update-collection side effect).  Updates happen only when the caller
  passes ``update_sn=True`` AND the collection is mutable, so the
  "one PI step per optimizer step" semantics survive applying the
  critic several times (real / fake / interpolates) inside one loss.
* ``u`` is replicated across data-parallel shards and updated from
  replicated weights, so it stays bit-identical on every chip
  (SURVEY.md §7 hard-part #4).
* sigma is computed with stop-gradient on u, v (standard SN), keeping
  the weight path differentiable — including twice-differentiable for
  the witness gradient penalty / SMMD double backprop.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

default_kernel_init = nn.initializers.normal(stddev=0.02)  # DCGAN-style


def lrelu(x: Array, slope: float = 0.2) -> Array:
    """Leaky ReLU with the lineage's 0.2 slope."""
    return nn.leaky_relu(x, negative_slope=slope)


def l2_normalize(v: Array, eps: float = 1e-12) -> Array:
    return v * jax.lax.rsqrt(jnp.sum(v * v) + eps)


def power_iteration(w_mat: Array, u: Array, n_iters: int = 1,
                    eps: float = 1e-12) -> Tuple[Array, Array]:
    """One (or more) power-iteration steps for the top singular value.

    Args:
      w_mat: (rows, out) reshaped weight matrix.
      u: (out,) persistent right-singular estimate.
    Returns:
      (sigma, new_u): spectral-norm estimate (scalar, differentiable
      w.r.t. w_mat with u/v treated as constants) and the updated u.
    """

    def body(_, u):
        v = l2_normalize(w_mat @ u, eps)          # (rows,)
        u = l2_normalize(w_mat.T @ v, eps)        # (out,)
        return u

    u = jax.lax.fori_loop(0, n_iters, body, u)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(l2_normalize(w_mat @ u, eps))
    sigma = v @ (w_mat @ u)
    return sigma, u


class _SNMixin:
    """Shared spectral-norm machinery for dense/conv modules."""

    def _spectral_sigma(self, kernel: Array, update_sn: bool) -> Array:
        out_features = kernel.shape[-1]
        w_mat = kernel.reshape(-1, out_features)
        u_var = self.variable(
            "spectral", "u",
            lambda: l2_normalize(
                jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                  else jax.random.PRNGKey(0), (out_features,))),
        )
        sigma, new_u = power_iteration(w_mat, u_var.value, self.sn_iters)
        if update_sn and not self.is_initializing() and self.is_mutable_collection("spectral"):
            u_var.value = new_u
        return sigma


class SNDense(nn.Module, _SNMixin):
    """Dense layer with optional spectral normalization.

    ``dtype``: compute dtype (params stay float32; bfloat16 compute
    feeds the MXU at 2x — the SN power iteration always runs f32).
    """

    features: int
    use_bias: bool = True
    use_sn: bool = False
    sn_iters: int = 1
    kernel_init: Callable = default_kernel_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        if self.use_sn:
            kernel = kernel / self._spectral_sigma(kernel, update_sn)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.dot(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


class SNConv(nn.Module, _SNMixin):
    """2-D convolution (NHWC) with optional spectral normalization."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    use_sn: bool = False
    sn_iters: int = 1
    kernel_init: Callable = default_kernel_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, update_sn: bool = False) -> Array:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        if self.use_sn:
            kernel = kernel / self._spectral_sigma(kernel, update_sn)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


def ConvTranspose(features: int,
                  kernel_size: Tuple[int, int] = (4, 4),
                  strides: Tuple[int, int] = (2, 2),
                  use_bias: bool = True,
                  kernel_init: Callable = default_kernel_init,
                  dtype=None,
                  name: str = None) -> nn.ConvTranspose:
    """Stride-2 transposed conv (the reference's deconv2d).

    flax's ConvTranspose lowers to one input-dilated XLA conv that
    tiles onto the MXU; we only pin the lineage's 4x4/stride-2/SAME
    defaults and the normal(0.02) init.
    """
    return nn.ConvTranspose(features=features, kernel_size=kernel_size,
                            strides=strides, padding="SAME",
                            use_bias=use_bias, kernel_init=kernel_init,
                            dtype=dtype, name=name)


def upsample_nearest(x: Array, factor: int = 2) -> Array:
    """Nearest-neighbor 2x upsample via reshape/broadcast (no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def avg_pool_2x(x: Array) -> Array:
    """2x2 mean pool, stride 2."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
