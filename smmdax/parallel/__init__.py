"""Distributed estimators and mesh utilities.

The reference is single-GPU (SURVEY.md §2 parallelism census: all
strategies absent); this package is the new capability layer:

* ``ring``: block-row ring computation of the global-batch kernel Gram
  statistics over ICI (the structural analog of ring attention applied
  to the O(B_g^2) kernel matrix — SURVEY.md §5 "long-context" row).
  Peak memory per chip drops from O(B_g^2) to O(B_g^2 / N) while the
  estimator stays bit-consistent with the single-device one.
"""

from smmdax.parallel.ring import ring_mmd_sums, ring_mmd2  # noqa: F401
