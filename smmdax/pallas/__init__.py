"""Pallas/Mosaic TPU kernels for the MMD hot path.

The TPU-native equivalent of the reference's hot native paths (which
lived inside TF's prebuilt CUDA kernels — SURVEY.md §2 native-code
census): a fused pairwise-kernel-matrix + MMD-reduction kernel that
never materializes the B x B Gram matrix in HBM, with a custom VJP
whose backward pass is the same tiling (one extra MXU matmul per
tile).  The pure-jnp path in smmdax.kernels is the always-on oracle;
everything here is tested against it (SURVEY.md §7 step 5).
"""

from smmdax.pallas.dispatch import should_use_pallas  # noqa: F401
from smmdax.pallas.mmd_kernel import (  # noqa: F401
    make_fused_mmd_sums,
    make_pair_stats,
    make_pair_sum,
    make_row_stats,
    fused_mmd2,
)
