"""Pairwise kernel matrices over critic features.

Covers the reference kernel set (SURVEY.md component #3, ``core/mmd.py``
of the reference lineage): Gaussian/RBF mixtures, rational-quadratic
mixtures, the dot-product kernel and the energy-distance kernel.  The
[SPEC] kernel surface is {gaussian, rq}; dot and distance are carried
for parity with the lineage.

TPU notes: all pairwise distances are computed via one MXU matmul
(``x @ y.T``) plus rank-1 norm broadcasts — never an explicit
(m, n, d) difference tensor.  Everything is float32; the feature dim
``d = dof_dim`` is tiny (<=128) so these matrices are cheap relative to
the conv stacks, but the matmul formulation is what lets the Pallas
fused path (smmdax.pallas) tile the same math onto the MXU for global
batches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Distances feed exp()/pow() — bf16 MXU passes (the TPU default) are not
# acceptable here; force full-f32 accumulation.  The conv stacks elsewhere
# keep the fast default.
_F32 = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

# Self-distance guard for the energy-distance kernel: k(x,x) = -sqrt(eps).
# Single source of truth — the Pallas kernels and ring estimators import
# this so diagonal constants can never drift.
DIST_EPS = 1e-8


class KernelBlocks(NamedTuple):
    """The three Gram blocks plus the (constant) diagonal value.

    ``k_diag`` is the value of k(x, x) when it is constant across inputs
    (sum of mixture weights for RBF/RQ; 0 for the distance kernel), else
    ``None`` (dot kernel).  The unbiased MMD estimator uses it to strip
    diagonals without materializing them.
    """

    k_xx: Array
    k_xy: Array
    k_yy: Array
    k_diag: Optional[float]


def sq_dists(x: Array, y: Array) -> Array:
    """Pairwise squared Euclidean distances, (m, d) x (n, d) -> (m, n).

    ||x_i - y_j||^2 = ||x_i||^2 + ||y_j||^2 - 2 <x_i, y_j>, clamped at 0
    against catastrophic cancellation (the reference guards numerics the
    same way with eps clamps / check_numerics).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    xy = jnp.dot(x, y.T, **_F32)
    return jnp.maximum(xx + yy - 2.0 * xy, 0.0)


def _mix_rbf(d2: Array, sigmas: Sequence[float], wts: Optional[Sequence[float]]) -> Array:
    if wts is None:
        wts = [1.0] * len(sigmas)
    k = jnp.zeros_like(d2)
    for sigma, w in zip(sigmas, wts):
        gamma = 1.0 / (2.0 * float(sigma) ** 2)
        k = k + float(w) * jnp.exp(-gamma * d2)
    return k


def _mix_rq(d2: Array, alphas: Sequence[float], wts: Optional[Sequence[float]],
            add_dot: float = 0.0, dot: Optional[Array] = None) -> Array:
    """Rational-quadratic mixture k(x,y) = sum_a w_a (1 + ||x-y||^2 / (2a))^-a.

    ``add_dot`` optionally adds ``add_dot * <x, y>`` (the lineage's
    ``mix_rq_dot`` variant used to keep the critic from collapsing
    scale).
    """
    if wts is None:
        wts = [1.0] * len(alphas)
    k = jnp.zeros_like(d2)
    for alpha, w in zip(alphas, wts):
        a = float(alpha)
        # exp(-a * log1p(d2 / (2a))) is the numerically-stable power form.
        log1p = jnp.log1p(d2 / (2.0 * a))
        k = k + float(w) * jnp.exp(-a * log1p)
    if add_dot and dot is not None:
        k = k + add_dot * dot
    return k


def mix_rbf_kernel(x: Array, y: Array,
                   sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
                   wts: Optional[Sequence[float]] = None) -> KernelBlocks:
    """Gaussian mixture Gram blocks for features x (m,d), y (n,d)."""
    k_xx = _mix_rbf(sq_dists(x, x), sigmas, wts)
    k_xy = _mix_rbf(sq_dists(x, y), sigmas, wts)
    k_yy = _mix_rbf(sq_dists(y, y), sigmas, wts)
    diag = float(sum(wts)) if wts is not None else float(len(sigmas))
    return KernelBlocks(k_xx, k_xy, k_yy, diag)


def mix_rq_kernel(x: Array, y: Array,
                  alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
                  wts: Optional[Sequence[float]] = None,
                  add_dot: float = 0.0) -> KernelBlocks:
    """Rational-quadratic mixture Gram blocks."""
    dot_xx = dot_xy = dot_yy = None
    if add_dot:
        dot_xx = jnp.dot(x, x.T, **_F32)
        dot_xy = jnp.dot(x, y.T, **_F32)
        dot_yy = jnp.dot(y, y.T, **_F32)
    k_xx = _mix_rq(sq_dists(x, x), alphas, wts, add_dot, dot_xx)
    k_xy = _mix_rq(sq_dists(x, y), alphas, wts, add_dot, dot_xy)
    k_yy = _mix_rq(sq_dists(y, y), alphas, wts, add_dot, dot_yy)
    diag = float(sum(wts)) if wts is not None else float(len(alphas))
    # with add_dot the diagonal is no longer constant
    return KernelBlocks(k_xx, k_xy, k_yy, None if add_dot else diag)


def dot_kernel(x: Array, y: Array) -> KernelBlocks:
    """Linear kernel k(x,y) = <x, y> (diagonal not constant)."""
    return KernelBlocks(
        jnp.dot(x, x.T, **_F32),
        jnp.dot(x, y.T, **_F32),
        jnp.dot(y, y.T, **_F32),
        None,
    )


def distance_kernel(x: Array, y: Array) -> KernelBlocks:
    """Energy-distance kernel k(x,y) = -||x - y|| (Cramer-GAN lineage).

    Conditionally negative definite; MMD with it equals the energy
    distance.  k(x,x) = 0 so k_diag = 0.
    """
    eps = DIST_EPS
    diag = -float(eps) ** 0.5
    # pin self-distances to exactly sqrt(eps): the matmul-based distance
    # leaves O(1e-4) cancellation residue on the diagonal otherwise
    k_xx = -jnp.sqrt(jnp.fill_diagonal(sq_dists(x, x), 0.0, inplace=False) + eps)
    k_xy = -jnp.sqrt(sq_dists(x, y) + eps)
    k_yy = -jnp.sqrt(jnp.fill_diagonal(sq_dists(y, y), 0.0, inplace=False) + eps)
    return KernelBlocks(k_xx, k_xy, k_yy, diag)


def kernel_cross(name: str, x: Array, y: Array, *,
                 rbf_sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
                 rq_alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
                 add_dot: float = 0.0) -> Array:
    """Just the (m, n) cross Gram block K_XY (used by the witness fn)."""
    if name == "gaussian":
        return _mix_rbf(sq_dists(x, y), rbf_sigmas, None)
    if name == "rq":
        dot = jnp.dot(x, y.T, **_F32) if add_dot else None
        return _mix_rq(sq_dists(x, y), rq_alphas, None, add_dot, dot)
    if name == "dot":
        return jnp.dot(x, y.T, **_F32)
    if name == "distance":
        return -jnp.sqrt(sq_dists(x, y) + DIST_EPS)
    raise ValueError(f"unknown kernel {name!r}")


def kernel_matrices(name: str, x: Array, y: Array, *,
                    rbf_sigmas: Sequence[float] = (1.0, 2.0, 4.0, 8.0, 16.0),
                    rq_alphas: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0),
                    add_dot: float = 0.0) -> KernelBlocks:
    """Dispatch matching the reference kernel flag set {gaussian, rq, ...}.

    ``add_dot`` (rq only) adds ``add_dot * <x, y>`` to the mixture —
    the lineage's ``mix_rq_dot`` variant.
    """
    if name == "gaussian":
        return mix_rbf_kernel(x, y, sigmas=rbf_sigmas)
    if name == "rq":
        return mix_rq_kernel(x, y, alphas=rq_alphas, add_dot=add_dot)
    if name == "dot":
        return dot_kernel(x, y)
    if name == "distance":
        return distance_kernel(x, y)
    raise ValueError(f"unknown kernel {name!r}")
