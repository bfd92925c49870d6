"""MMD^2 estimators, variance estimate and the t-ratio objective.

Math sources (these fully determine the estimators; see SURVEY.md §0):
  * Gretton et al., "A Kernel Two-Sample Test", JMLR 2012 — the unbiased
    U-statistic MMD^2_u and the biased V-statistic.
  * Sutherland et al., "Generative Models and Model Criticism via
    Optimized MMD", ICLR 2017, appendix A — the O(m^2) variance
    estimator of MMD^2_u used for the t-ratio objective.
  * Binkowski et al., "Demystifying MMD GANs", ICLR 2018 — usage of the
    ratio objective in the MMD-GAN lineage (reference core/mmd.py,
    SURVEY.md component #3).

Supports unequal sample sizes m != n (the reference exposes
``real_batch_size`` != ``batch_size``), constant-diagonal fast paths,
and an accumulator ("blocks") form used by the data-parallel ring
estimator and the Pallas fused kernel so a sharded global-batch
estimate is bit-consistent with the single-device one.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from smmdax.kernels.kernels import KernelBlocks

Array = jnp.ndarray

_MIN_VAR_EST = 1e-8


class MMDSums(NamedTuple):
    """Sufficient statistics for MMD^2 over (possibly sharded) blocks.

    sum_xx / sum_yy are OFF-DIAGONAL sums of K_XX / K_YY; sum_xy is the
    full sum of K_XY.  m, n are the (global) sample counts.  These are
    plain sums, so partial results from row-blocks of the Gram matrix
    add up exactly — that additivity is what the ring estimator psums.
    """

    sum_xx: Array
    sum_yy: Array
    sum_xy: Array
    m: Array
    n: Array

    def __add__(self, other: "MMDSums") -> "MMDSums":  # type: ignore[override]
        # m, n describe the same global batch on every shard: keep them.
        return MMDSums(self.sum_xx + other.sum_xx,
                       self.sum_yy + other.sum_yy,
                       self.sum_xy + other.sum_xy,
                       self.m, self.n)


def _offdiag_sum(k: Array, k_diag: Optional[float]) -> Array:
    m = k.shape[0]
    total = jnp.sum(k)
    if k_diag is None:
        return total - jnp.trace(k)
    return total - m * k_diag


def mmd_sums(blocks: KernelBlocks) -> MMDSums:
    m = blocks.k_xx.shape[0]
    n = blocks.k_yy.shape[0]
    return MMDSums(
        _offdiag_sum(blocks.k_xx, blocks.k_diag),
        _offdiag_sum(blocks.k_yy, blocks.k_diag),
        jnp.sum(blocks.k_xy),
        jnp.asarray(m, jnp.float32),
        jnp.asarray(n, jnp.float32),
    )


def mmd2_from_sums(s: MMDSums, biased: bool = False,
                   diag_xx: Optional[Array] = None,
                   diag_yy: Optional[Array] = None) -> Array:
    """MMD^2 from sufficient statistics.

    For the biased V-statistic the diagonal sums must be supplied (or
    are zero for constant-diagonal kernels folded into sum_*).
    """
    m, n = s.m, s.n
    if biased:
        dxx = 0.0 if diag_xx is None else diag_xx
        dyy = 0.0 if diag_yy is None else diag_yy
        return ((s.sum_xx + dxx) / (m * m)
                + (s.sum_yy + dyy) / (n * n)
                - 2.0 * s.sum_xy / (m * n))
    return (s.sum_xx / (m * (m - 1.0))
            + s.sum_yy / (n * (n - 1.0))
            - 2.0 * s.sum_xy / (m * n))


def mmd2(blocks: KernelBlocks, biased: bool = False) -> Array:
    """Unbiased (default) or biased MMD^2 from full Gram blocks."""
    s = mmd_sums(blocks)
    if biased:
        if blocks.k_diag is None:
            dxx = jnp.trace(blocks.k_xx)
            dyy = jnp.trace(blocks.k_yy)
        else:
            dxx = blocks.k_xx.shape[0] * blocks.k_diag
            dyy = blocks.k_yy.shape[0] * blocks.k_diag
        return mmd2_from_sums(s, biased=True, diag_xx=dxx, diag_yy=dyy)
    return mmd2_from_sums(s, biased=False)


def mmd2_from_blocks(k_xx: Array, k_xy: Array, k_yy: Array,
                     k_diag: Optional[float] = None,
                     biased: bool = False) -> Array:
    return mmd2(KernelBlocks(k_xx, k_xy, k_yy, k_diag), biased=biased)


class VarStats(NamedTuple):
    """Sufficient statistics for the Sutherland variance estimator.

    Everything here is a sum over (blocks of) the global Gram matrices —
    scalar dot-products of row-sum vectors included — so a sharded
    computation produces them with per-shard partial sums + one psum
    (the ring t-ratio path, smmdax.parallel.ring).  "kt_*" quantities
    exclude the diagonal.
    """

    m: Array               # sample count (estimator requires m == n)
    kt_xx_sum: Array       # sum of off-diagonal K_XX
    kt_yy_sum: Array
    k_xy_sum: Array        # full sum of K_XY
    kt_xx_2_sum: Array     # sum of squared off-diagonal entries
    kt_yy_2_sum: Array
    k_xy_2_sum: Array
    dot_xx_rows: Array     # <row_sums(K~_XX), row_sums(K~_XX)>
    dot_yy_rows: Array
    dot_xy_rows: Array     # <row_sums(K_XY), row_sums(K_XY)>  (per-x)
    dot_xy_cols: Array     # <col_sums(K_XY), col_sums(K_XY)>  (per-y)
    dot_xx_xy: Array       # <row_sums(K~_XX), row_sums(K_XY)>
    dot_yy_xy: Array       # <row_sums(K~_YY), col_sums(K_XY)>
    sum_diag_x: Array      # diagonal sums (biased estimator only)
    sum_diag_y: Array


def var_stats_from_blocks(blocks: KernelBlocks) -> VarStats:
    """Dense-Gram path: reduce full blocks to the sufficient stats."""
    k_xx, k_xy, k_yy, k_diag = blocks
    m = k_xx.shape[0]
    if k_yy.shape[0] != m:
        raise ValueError("variance estimator requires m == n")
    mf = jnp.asarray(m, jnp.float32)

    if k_diag is None:
        diag_x = jnp.diag(k_xx)
        diag_y = jnp.diag(k_yy)
        sum_diag_x = jnp.sum(diag_x)
        sum_diag_y = jnp.sum(diag_y)
        sum_diag2_x = jnp.sum(diag_x * diag_x)
        sum_diag2_y = jnp.sum(diag_y * diag_y)
    else:
        diag_x = diag_y = k_diag
        sum_diag_x = sum_diag_y = mf * k_diag
        sum_diag2_x = sum_diag2_y = mf * k_diag * k_diag

    kt_xx_sums = jnp.sum(k_xx, axis=1) - diag_x      # row sums, no diagonal
    kt_yy_sums = jnp.sum(k_yy, axis=1) - diag_y
    k_xy_sums_0 = jnp.sum(k_xy, axis=0)              # over x index -> per-y
    k_xy_sums_1 = jnp.sum(k_xy, axis=1)              # over y index -> per-x

    return VarStats(
        m=mf,
        kt_xx_sum=jnp.sum(kt_xx_sums),
        kt_yy_sum=jnp.sum(kt_yy_sums),
        k_xy_sum=jnp.sum(k_xy_sums_0),
        kt_xx_2_sum=jnp.sum(k_xx * k_xx) - sum_diag2_x,
        kt_yy_2_sum=jnp.sum(k_yy * k_yy) - sum_diag2_y,
        k_xy_2_sum=jnp.sum(k_xy * k_xy),
        dot_xx_rows=jnp.dot(kt_xx_sums, kt_xx_sums),
        dot_yy_rows=jnp.dot(kt_yy_sums, kt_yy_sums),
        dot_xy_rows=jnp.dot(k_xy_sums_1, k_xy_sums_1),
        dot_xy_cols=jnp.dot(k_xy_sums_0, k_xy_sums_0),
        dot_xx_xy=jnp.dot(kt_xx_sums, k_xy_sums_1),
        dot_yy_xy=jnp.dot(kt_yy_sums, k_xy_sums_0),
        sum_diag_x=jnp.asarray(sum_diag_x, jnp.float32),
        sum_diag_y=jnp.asarray(sum_diag_y, jnp.float32),
    )


def mmd2_and_variance_from_stats(s: VarStats,
                                 biased: bool = False) -> Tuple[Array, Array]:
    """MMD^2 + variance from sufficient stats (shared by the dense and
    ring paths).  Formula: ICLR 2017 arXiv:1611.04488, appendix A."""
    mf = s.m
    if biased:
        mmd2_val = ((s.kt_xx_sum + s.sum_diag_x) / (mf * mf)
                    + (s.kt_yy_sum + s.sum_diag_y) / (mf * mf)
                    - 2.0 * s.k_xy_sum / (mf * mf))
    else:
        mmd2_val = (s.kt_xx_sum / (mf * (mf - 1.0))
                    + s.kt_yy_sum / (mf * (mf - 1.0))
                    - 2.0 * s.k_xy_sum / (mf * mf))

    var_est = (
        2.0 / (mf**2 * (mf - 1.0)**2)
        * (2.0 * s.dot_xx_rows - s.kt_xx_2_sum
           + 2.0 * s.dot_yy_rows - s.kt_yy_2_sum)
        - (4.0 * mf - 6.0) / (mf**3 * (mf - 1.0)**3)
        * (s.kt_xx_sum**2 + s.kt_yy_sum**2)
        + 4.0 * (mf - 2.0) / (mf**3 * (mf - 1.0)**2)
        * (s.dot_xy_rows + s.dot_xy_cols)
        - 4.0 * (mf - 3.0) / (mf**3 * (mf - 1.0)**2) * s.k_xy_2_sum
        - (8.0 * mf - 12.0) / (mf**5 * (mf - 1.0)) * s.k_xy_sum**2
        + 8.0 / (mf**3 * (mf - 1.0))
        * (1.0 / mf * (s.kt_xx_sum + s.kt_yy_sum) * s.k_xy_sum
           - s.dot_xx_xy - s.dot_yy_xy)
    )
    return mmd2_val, var_est


def mmd2_and_variance(blocks: KernelBlocks,
                      biased: bool = False) -> Tuple[Array, Array]:
    """MMD^2 and the Sutherland-et-al. variance estimate of MMD^2_u.

    Requires m == n (the estimator is defined for equal sample sizes;
    the reference t-ratio path has the same restriction).
    """
    return mmd2_and_variance_from_stats(var_stats_from_blocks(blocks),
                                        biased=biased)


def mmd2_and_ratio(blocks: KernelBlocks, biased: bool = False,
                   min_var_est: float = _MIN_VAR_EST) -> Tuple[Array, Array]:
    """The t-statistic-like objective mmd2 / sqrt(var) ('tmmd' model)."""
    val, var = mmd2_and_variance(blocks, biased=biased)
    ratio = val / jnp.sqrt(jnp.maximum(var, min_var_est))
    return val, ratio
