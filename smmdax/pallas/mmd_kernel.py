"""Fused pairwise-kernel + MMD-sum Pallas kernel (forward + VJP).

Computes, without materializing any (m, n) Gram matrix in HBM,

    S(a, b; exclude_diag) = sum_{i,j} mask * k(||a_i - b_j||^2)

for Gaussian-RBF / rational-quadratic mixtures, tiled over a 2-D
(row-tile, col-tile) grid so each program touches one (TM, d) block of
``a`` and one (TN, d) block of ``b`` in VMEM: one MXU matmul produces
the -2 a b^T term, the VPU applies the mixture, and a masked reduction
accumulates into an SMEM scalar (TPU grid programs run sequentially on
a core, so `+=` accumulation across programs is safe).  VMEM use is
O(TM*TN), independent of batch size — global batches of 100k+ features
stream through without ever materializing a Gram matrix.

Backward: for the scalar cotangent c,

    dS/da_i = c * 4 (or 2 for cross blocks) * sum_j g(d2_ij) (a_i - b_j)
            = c * f * [rowsum(G)_i * a_i  -  (G @ b)_i]

with g = dk/d(d2) — the same tiling with ONE extra MXU matmul (G @ b)
per tile, so the backward never materializes G either.

Padding convention: inputs are zero-padded to (8, 128) multiples; the
kernel masks padded rows/cols by comparing broadcasted iotas against
the true (static) m, n.  All math f32.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_INTERPRET = False  # flipped by tests on CPU


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mixture_k(d2, kernel: str, params: Sequence[float]):
    k = jnp.zeros_like(d2)
    if kernel == "gaussian":
        for s in params:
            k += jnp.exp(d2 * (-1.0 / (2.0 * float(s) ** 2)))
    elif kernel == "rq":
        for a in params:
            a = float(a)
            k += jnp.exp(-a * jnp.log1p(d2 / (2.0 * a)))
    else:
        raise ValueError(kernel)
    return k


def _mixture_g(d2, kernel: str, params: Sequence[float]):
    """g = dk/d(d2) of the mixture."""
    g = jnp.zeros_like(d2)
    if kernel == "gaussian":
        for s in params:
            gamma = 1.0 / (2.0 * float(s) ** 2)
            g += -gamma * jnp.exp(-gamma * d2)
    elif kernel == "rq":
        for a in params:
            a = float(a)
            g += -0.5 * jnp.exp(-(a + 1.0) * jnp.log1p(d2 / (2.0 * a)))
    else:
        raise ValueError(kernel)
    return g


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(a_ref, b_ref, out_ref, *, kernel, params, m, n, tm, tn,
                exclude_diag):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    a = a_ref[...]                    # (TM, D)
    b = b_ref[...]                    # (TN, D)
    d2 = (jnp.sum(a * a, axis=1, keepdims=True)
          + jnp.sum(b * b, axis=1, keepdims=True).T
          - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32))
    d2 = jnp.maximum(d2, 0.0)
    k = _mixture_k(d2, kernel, params)

    rows = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) + i * tm
    cols = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1) + j * tn
    mask = (rows < m) & (cols < n)
    if exclude_diag:
        mask &= rows != cols
    out_ref[0, 0] += jnp.sum(jnp.where(mask, k, 0.0))


def _pair_sum(a: Array, b: Array, kernel: str, params, exclude_diag: bool,
              tm: int = 256, tn: int = 512) -> Array:
    m, d = a.shape
    n, _ = b.shape
    tm = min(tm, _round_up(m, 8))        # don't pad small batches up to
    tn = min(tn, _round_up(n, 128))      # full tiles (30x waste at B=64)
    mp, np_, dp = _round_up(m, tm), _round_up(n, tn), _round_up(d, 128)
    a = jnp.pad(a.astype(jnp.float32), ((0, mp - m), (0, dp - d)))
    b = jnp.pad(b.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kernel=kernel, params=tuple(params),
                          m=m, n=n, tm=tm, tn=tn, exclude_diag=exclude_diag),
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_INTERPRET,
    )(a, b)
    return out[0, 0]


# ---------------------------------------------------------------------------
# backward


def _bwd_kernel(a_ref, b_ref, da_ref, *, kernel, params, m, n, tm, tn,
                exclude_diag):
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = a_ref[...]
    b = b_ref[...]
    d2 = (jnp.sum(a * a, axis=1, keepdims=True)
          + jnp.sum(b * b, axis=1, keepdims=True).T
          - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32))
    d2 = jnp.maximum(d2, 0.0)
    g = _mixture_g(d2, kernel, params)

    rows = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + i * tm
    cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1) + j * tn
    mask = (rows < m) & (cols < n)
    if exclude_diag:
        mask &= rows != cols
    g = jnp.where(mask, g, 0.0)

    rowsum = jnp.sum(g, axis=1, keepdims=True)           # (TM, 1)
    gb = jnp.dot(g, b, preferred_element_type=jnp.float32)  # (TM, D)
    part = rowsum * a - gb

    # column tiles accumulate into the same row-block of da (grid runs
    # sequentially on a TPU core, so += across j is safe)
    @pl.when(j == 0)
    def _():
        da_ref[...] = part

    @pl.when(j != 0)
    def _():
        da_ref[...] += part


def _pair_sum_grad_a(a: Array, b: Array, kernel: str, params,
                     exclude_diag: bool, tm: int = 256, tn: int = 512) -> Array:
    """d/da of sum_{ij} k(d2(a_i, b_j)) WITHOUT the cotangent/pair
    factor: returns sum_j g_ij (a_i - b_j), shape of a."""
    m, d = a.shape
    n, _ = b.shape
    tm = min(tm, _round_up(m, 8))
    tn = min(tn, _round_up(n, 128))
    mp, np_, dp = _round_up(m, tm), _round_up(n, tn), _round_up(d, 128)
    ap = jnp.pad(a.astype(jnp.float32), ((0, mp - m), (0, dp - d)))
    bp = jnp.pad(b.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    da = pl.pallas_call(
        functools.partial(_bwd_kernel, kernel=kernel, params=tuple(params),
                          m=m, n=n, tm=tm, tn=tn, exclude_diag=exclude_diag),
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, dp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        interpret=_INTERPRET,
    )(ap, bp)
    return da[:m, :d]


# ---------------------------------------------------------------------------
# public: custom-vjp'd sufficient statistics + mmd2


def make_fused_mmd_sums(kernel: str, params: Sequence[float]):
    """Returns fused_sums(x, y) -> (sum_xx_offdiag, sum_yy_offdiag,
    sum_xy), differentiable w.r.t. x and y (first order)."""
    params = tuple(float(p) for p in params)

    @jax.custom_vjp
    def fused_sums(x, y):
        return (_pair_sum(x, x, kernel, params, True),
                _pair_sum(y, y, kernel, params, True),
                _pair_sum(x, y, kernel, params, False))

    def fwd(x, y):
        return fused_sums(x, y), (x, y)

    def bwd(res, cots):
        x, y = res
        c_xx, c_yy, c_xy = cots
        # sum_xx: each unordered pair appears twice; d/dx_i picks up the
        # (i,j) and (j,i) terms -> factor 4 on g_ij (x_i - x_j) with the
        # "2" from d(d2)/dx = 2(x_i - x_j) folded in.
        dx = (4.0 * c_xx) * _pair_sum_grad_a(x, x, kernel, params, True)
        dx += (2.0 * c_xy) * _pair_sum_grad_a(x, y, kernel, params, False)
        dy = (4.0 * c_yy) * _pair_sum_grad_a(y, y, kernel, params, True)
        dy += (2.0 * c_xy) * _pair_sum_grad_a(y, x, kernel, params, False)
        return dx, dy

    fused_sums.defvjp(fwd, bwd)
    return fused_sums


def fused_mmd2(x: Array, y: Array, kernel: str = "rq",
               params: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
               biased: bool = False) -> Array:
    """Unbiased (or biased) MMD^2 via the fused Pallas path.

    Semantically identical to smmdax.kernels.mmd2(kernel_matrices(...))
    for constant-diagonal mixtures — the jnp oracle in the tests.
    """
    m = jnp.float32(x.shape[0])
    n = jnp.float32(y.shape[0])
    sums = make_fused_mmd_sums(kernel, params)(x, y)
    s_xx, s_yy, s_xy = sums
    if biased:
        k_diag = float(len(params))
        return ((s_xx + x.shape[0] * k_diag) / (m * m)
                + (s_yy + y.shape[0] * k_diag) / (n * n)
                - 2.0 * s_xy / (m * n))
    return (s_xx / (m * (m - 1.0)) + s_yy / (n * (n - 1.0))
            - 2.0 * s_xy / (m * n))


def make_pair_sum(kernel: str, params: Sequence[float], exclude_diag: bool):
    """Differentiable fused S(a, b) = sum_{ij} mask * k(d2(a_i, b_j)).

    The building block the ring estimator tiles over ICI: each shard
    computes its row-block pair sums through this kernel (O(tile) VMEM)
    instead of materializing jnp Gram blocks.  The VJP reuses the
    backward tiling; when a and b are the same tensor the two argument
    cotangents add up to the correct factor-4 pair gradient.
    """
    params = tuple(float(p) for p in params)

    @jax.custom_vjp
    def pair_sum(a, b):
        return _pair_sum(a, b, kernel, params, exclude_diag)

    def fwd(a, b):
        return pair_sum(a, b), (a, b)

    def bwd(res, c):
        a, b = res
        da = (2.0 * c) * _pair_sum_grad_a(a, b, kernel, params, exclude_diag)
        db = (2.0 * c) * _pair_sum_grad_a(b, a, kernel, params, exclude_diag)
        return da, db

    pair_sum.defvjp(fwd, bwd)
    return pair_sum
