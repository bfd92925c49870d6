"""Ring (block-row) global-batch MMD estimator.

Called INSIDE ``shard_map`` over a 1-D data mesh: each shard owns one
row-block of critic features and, over N-1 ``ppermute`` rotations,
computes its row-block of the three global Gram blocks against every
column block as it arrives over ICI — accumulating only the scalar
partial sums, never a full (B_g, B_g) matrix.  A final ``psum`` yields
the global sufficient statistics; the result is numerically the
single-device global-batch estimator (property-tested on an 8-device
CPU mesh — SURVEY.md §7 hard-part #3: consistent diagonal exclusion is
exactly what this module owns).

Differentiable: the VJP of ``ppermute`` is the reverse rotation, so
``jax.grad`` through a ring step yields the correct cross-shard
gradients automatically.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from smmdax.kernels import kernel_cross
from smmdax.kernels.mmd import (MMDSums, VarStats, mmd2_and_variance_from_stats,
                                mmd2_from_sums)

Array = jnp.ndarray

# Kernels the ring estimators (and their fused Pallas block paths)
# support — the full loss-surface set.  The mixtures have constant
# diagonals; data-dependent diagonals (the rq+add_dot mix_rq_dot
# variant's const + w*||x||^2, and the pure dot kernel's ||x||^2) are
# handled explicitly (masked exclusion / computed traces / psum'd norm
# sums).  "dot" canonicalizes to the empty mixture + add_dot=1
# (pallas.mmd_kernel.canon_kernel), so it shares every code path.
RING_KERNELS = ("gaussian", "rq", "distance", "dot")


def _block_sum(name: str, a: Array, b: Array, exclude_diag: bool,
               rbf_sigmas, rq_alphas, use_pallas: bool = False,
               add_dot: float = 0.0) -> Array:
    if use_pallas and name in RING_KERNELS:
        from smmdax.pallas import make_pair_sum
        params = rbf_sigmas if name == "gaussian" else rq_alphas
        return make_pair_sum(name, params, exclude_diag,
                             add_dot=add_dot)(a, b)
    k = kernel_cross(name, a, b, rbf_sigmas=rbf_sigmas, rq_alphas=rq_alphas,
                     add_dot=add_dot)
    s = jnp.sum(k)
    if exclude_diag:
        s = s - jnp.trace(k)
    return s


def ring_mmd_sums(x_loc: Array, y_loc: Array, axis_name: str,
                  kernel: str = "rq",
                  rbf_sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
                  rq_alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
                  use_pallas: bool = False,
                  add_dot: float = 0.0,
                  ) -> MMDSums:
    """Global MMD sufficient statistics from per-shard feature blocks.

    x_loc: (b, d) fake-feature shard; y_loc: (b_r, d) real-feature
    shard.  Returns GLOBAL (psum'd) off-diagonal sums and counts —
    feed to ``mmd2_from_sums``.
    """
    n_shards = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def body(t, carry):
        # t is a Python int (unrolled loop): exclude_diag folds to a
        # compile-time constant, so the own-block (t == 0) pair sum can
        # use the fused kernel's masked diagonal exclusion directly
        x_buf, y_buf, sxx, syy, sxy = carry
        own = t == 0
        sxx = sxx + _block_sum(kernel, x_loc, x_buf, own,
                               rbf_sigmas, rq_alphas, use_pallas, add_dot)
        syy = syy + _block_sum(kernel, y_loc, y_buf, own,
                               rbf_sigmas, rq_alphas, use_pallas, add_dot)
        sxy = sxy + _block_sum(kernel, x_loc, y_buf, False,
                               rbf_sigmas, rq_alphas, use_pallas, add_dot)
        x_buf = jax.lax.ppermute(x_buf, axis_name, perm)
        y_buf = jax.lax.ppermute(y_buf, axis_name, perm)
        return x_buf, y_buf, sxx, syy, sxy

    zero = jnp.float32(0.0)
    carry = (x_loc, y_loc, zero, zero, zero)
    # python loop (n_shards is static & small): lets t==0 fold to a
    # compile-time constant and keeps ppermute unrolled for overlap
    for t in range(n_shards):
        carry = body(t, carry)
    _, _, sxx, syy, sxy = carry

    sxx = jax.lax.psum(sxx, axis_name)
    syy = jax.lax.psum(syy, axis_name)
    sxy = jax.lax.psum(sxy, axis_name)
    m = jnp.float32(x_loc.shape[0] * n_shards)
    n = jnp.float32(y_loc.shape[0] * n_shards)
    return MMDSums(sxx, syy, sxy, m, n)


def ring_mmd2(x_loc: Array, y_loc: Array, axis_name: str,
              kernel: str = "rq",
              rbf_sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
              rq_alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
              biased: bool = False, use_pallas: bool = False,
              add_dot: float = 0.0) -> Array:
    """Unbiased global-batch MMD^2 from per-shard features.  The
    unbiased estimator excludes diagonals by mask/trace, so the
    data-dependent diagonal ``add_dot`` introduces costs nothing; for
    ``biased`` the diagonal values are added back from the local
    traces (computed, so add_dot's w*||x||^2 term is included)."""
    sums = ring_mmd_sums(x_loc, y_loc, axis_name, kernel,
                         rbf_sigmas, rq_alphas, use_pallas=use_pallas,
                         add_dot=add_dot)
    if biased:
        diag_xx = jax.lax.psum(jnp.trace(kernel_cross(
            kernel, x_loc, x_loc, rbf_sigmas=rbf_sigmas,
            rq_alphas=rq_alphas, add_dot=add_dot)), axis_name)
        diag_yy = jax.lax.psum(jnp.trace(kernel_cross(
            kernel, y_loc, y_loc, rbf_sigmas=rbf_sigmas,
            rq_alphas=rq_alphas, add_dot=add_dot)), axis_name)
        return mmd2_from_sums(sums, biased=True, diag_xx=diag_xx,
                              diag_yy=diag_yy)
    return mmd2_from_sums(sums, biased=False)


def _const_diag(kernel: str, rbf_sigmas, rq_alphas) -> float:
    """k(x, x) for the constant-diagonal kernels the ring paths serve
    (single source of truth: smmdax.pallas.mmd_kernel.kernel_diag)."""
    if kernel not in RING_KERNELS:
        raise ValueError(
            f"ring estimators need a constant-diagonal kernel, got {kernel!r}")
    from smmdax.pallas.mmd_kernel import kernel_diag
    return kernel_diag(kernel,
                       rbf_sigmas if kernel == "gaussian" else rq_alphas)


def ring_var_stats(x_loc: Array, y_loc: Array, axis_name: str,
                   kernel: str = "rq",
                   rbf_sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
                   rq_alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
                   use_pallas: bool = False,
                   add_dot: float = 0.0,
                   ) -> VarStats:
    """Global t-ratio sufficient statistics from per-shard features.

    The Sutherland variance estimator is entirely row-sums, squared
    sums and their dot products (smmdax.kernels.mmd.VarStats), all of
    which are additive over Gram row-blocks:

    * per-LOCAL-row accumulators (K~_XX / K~_YY / K_XY row sums) live on
      the shard that owns the rows and collect contributions from every
      column block as it rotates past;
    * the per-y COLUMN sums of K_XY travel WITH the rotating y block
      (a ring reduce): after the full cycle each shard holds the
      complete column sums for its own y rows;
    * squared-entry sums accumulate as scalars.

    One psum over the scalars / local dot products then yields the
    exact global statistics — never materializing any (B_g, B_g) Gram
    matrix (O(B_g^2/N) work per shard, O(b^2) peak block memory).
    Requires equal global sample counts (m == n), like the dense
    estimator.
    """
    if x_loc.shape[0] != y_loc.shape[0]:
        raise ValueError("t-ratio variance estimator requires m == n")
    if kernel == "dot":
        # the canonical empty-mixture form (canon_kernel): const diag 0,
        # the whole kernel rides the add_dot machinery below
        kernel, rq_alphas, add_dot = "rq", (), 1.0
    n_shards = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    diag = _const_diag(kernel, rbf_sigmas, rq_alphas)
    b = x_loc.shape[0]

    def cross(a, c):
        return kernel_cross(kernel, a, c,
                            rbf_sigmas=rbf_sigmas, rq_alphas=rq_alphas,
                            add_dot=add_dot)

    if use_pallas and kernel in RING_KERNELS:
        # fused block statistics: row sums + sum of squares straight
        # from VMEM tiles, the (b, b) Gram block never hits HBM; the
        # masked diagonal exclusion replaces the constant subtraction.
        # Column sums (needed only for the xy block) are the row sums
        # of the swapped call — the xx/yy blocks skip that sweep.
        from smmdax.pallas import make_row_stats
        kp = rbf_sigmas if kernel == "gaussian" else rq_alphas
        rs_own = make_row_stats(kernel, kp, exclude_diag=True,
                                add_dot=add_dot)
        rs_off = make_row_stats(kernel, kp, exclude_diag=False,
                                add_dot=add_dot)

        def block_stats(a, c, own, want_cols=False):
            rows, sq = (rs_own if own else rs_off)(a, c)
            cols = rs_off(c, a)[0] if want_cols else None
            return rows, cols, sq
    else:
        def block_stats(a, c, own, want_cols=False):
            k = cross(a, c)
            rows = jnp.sum(k, axis=1)
            cols = jnp.sum(k, axis=0) if want_cols else None
            sq = jnp.sum(k * k)
            if own:
                # subtract the COMPUTED diagonal, not the idealized
                # constant: the matmul-form distances leave f32
                # cancellation residue on self-distances (worst for the
                # distance kernel: -sqrt(residue+eps) vs -1e-4), and
                # off-diagonal sums must be exact regardless
                dvec = jnp.diagonal(k)
                rows = rows - dvec
                sq = sq - jnp.sum(dvec * dvec)
            return rows, cols, sq

    zero = jnp.float32(0.0)
    zrow = jnp.zeros((b,), jnp.float32)
    x_buf, y_buf = x_loc, y_loc
    xx_rows, yy_rows, xy_rows = zrow, zrow, zrow
    xy_cols = zrow                       # travels with y_buf (ring reduce)
    kxx2 = kyy2 = kxy2 = zero

    # unrolled: t == 0 (own block) folds the diagonal exclusion to
    # compile-time constants, and XLA can overlap ppermute with the
    # next block's compute
    for t in range(n_shards):
        own = t == 0
        r_xx, _, s_xx = block_stats(x_loc, x_buf, own)
        r_yy, _, s_yy = block_stats(y_loc, y_buf, own)
        r_xy, c_xy, s_xy = block_stats(x_loc, y_buf, False, want_cols=True)
        xx_rows = xx_rows + r_xx
        yy_rows = yy_rows + r_yy
        kxx2 = kxx2 + s_xx
        kyy2 = kyy2 + s_yy
        xy_rows = xy_rows + r_xy
        xy_cols = xy_cols + c_xy
        kxy2 = kxy2 + s_xy
        x_buf = jax.lax.ppermute(x_buf, axis_name, perm)
        y_buf = jax.lax.ppermute(y_buf, axis_name, perm)
        xy_cols = jax.lax.ppermute(xy_cols, axis_name, perm)

    # xy_cols has completed the ring: it is home, holding the full
    # per-local-y column sums.  yy_rows indexes local y too, so their
    # dot products pair correctly shard-by-shard.
    def ps(v):
        return jax.lax.psum(v, axis_name)

    m = jnp.float32(b * n_shards)
    # diagonal sums (used by the biased estimator only): the constant
    # mixture part plus, with add_dot, the data-dependent w*||x||^2
    # term summed over the global batch
    sum_diag_x = m * diag
    sum_diag_y = m * diag
    if add_dot:
        sum_diag_x = sum_diag_x + add_dot * jax.lax.psum(
            jnp.sum(x_loc.astype(jnp.float32) ** 2), axis_name)
        sum_diag_y = sum_diag_y + add_dot * jax.lax.psum(
            jnp.sum(y_loc.astype(jnp.float32) ** 2), axis_name)
    return VarStats(
        m=m,
        kt_xx_sum=ps(jnp.sum(xx_rows)),
        kt_yy_sum=ps(jnp.sum(yy_rows)),
        k_xy_sum=ps(jnp.sum(xy_rows)),
        kt_xx_2_sum=ps(kxx2),
        kt_yy_2_sum=ps(kyy2),
        k_xy_2_sum=ps(kxy2),
        dot_xx_rows=ps(jnp.dot(xx_rows, xx_rows)),
        dot_yy_rows=ps(jnp.dot(yy_rows, yy_rows)),
        dot_xy_rows=ps(jnp.dot(xy_rows, xy_rows)),
        dot_xy_cols=ps(jnp.dot(xy_cols, xy_cols)),
        dot_xx_xy=ps(jnp.dot(xx_rows, xy_rows)),
        dot_yy_xy=ps(jnp.dot(yy_rows, xy_cols)),
        sum_diag_x=sum_diag_x,
        sum_diag_y=sum_diag_y,
    )


def ring_mmd2_and_ratio(x_loc: Array, y_loc: Array, axis_name: str,
                        kernel: str = "rq",
                        rbf_sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
                        rq_alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
                        min_var_est: float = 1e-8,
                        use_pallas: bool = False,
                        add_dot: float = 0.0,
                        ) -> Tuple[Array, Array]:
    """Global-batch (MMD^2, t-ratio) from per-shard features — the ring
    analog of ``smmdax.kernels.mmd.mmd2_and_ratio`` (tmmd model under
    data parallelism without gathering dense Gram blocks)."""
    stats = ring_var_stats(x_loc, y_loc, axis_name, kernel,
                           rbf_sigmas, rq_alphas, use_pallas=use_pallas,
                           add_dot=add_dot)
    val, var = mmd2_and_variance_from_stats(stats, biased=False)
    ratio = val / jnp.sqrt(jnp.maximum(var, min_var_est))
    return val, ratio
