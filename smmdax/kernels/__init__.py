"""Pairwise kernels and MMD estimators (pure jnp reference path).

This package is the numerical anchor of the framework: every fused /
Pallas / ring variant elsewhere is tested against these functions, and
these functions are tested against numpy goldens and the closed-form
math of the papers (Binkowski et al. 2018, arXiv:1801.01401; Arbel et
al. 2018, arXiv:1805.11565).
"""

from smmdax.kernels.kernels import (  # noqa: F401
    KernelBlocks,
    sq_dists,
    mix_rbf_kernel,
    mix_rq_kernel,
    dot_kernel,
    distance_kernel,
    kernel_cross,
    kernel_matrices,
)
from smmdax.kernels.mmd import (  # noqa: F401
    MMDSums,
    mmd_sums,
    mmd2,
    mmd2_from_blocks,
    mmd2_from_sums,
    mmd2_and_ratio,
    mmd2_and_variance,
)
from smmdax.kernels.smmd import smmd_scale  # noqa: F401
