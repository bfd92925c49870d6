"""The Scaled-MMD normalizer (Arbel et al. 2018, arXiv:1805.11565).

SMMD^2(P, Q) = MMD^2(P, Q) / sigma_{k, lambda} with

    sigma_{k, lambda} = lambda + E_mu[ k(x, x) + sum_i d/dx_i d/dy_i k(x,y)|_{y=x} ]

For a deep kernel k(x, y) = rho(phi(x), phi(y)) with translation-
invariant base rho (Gaussian/RQ mixtures), the derivative term reduces
to c_rho * ||J_phi(x)||_F^2 (Frobenius norm of the critic feature
Jacobian) and k(x,x) is a constant that lambda absorbs; for the dot
kernel, k(x,x) = ||phi(x)||^2 which the 'value_and_grad' scaling
variant adds (SURVEY.md component #4: scaling_variant selects grad-only
vs value+grad Sobolev estimate).

This module is the scalar bookkeeping; the Jacobian-norm estimates are
produced in smmdax.losses (they need the critic function).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

Array = jnp.ndarray


def smmd_scale(grad_sq_norms: Array,
               value_sq_norms: Optional[Array] = None,
               scaling_coeff: float = 10.0,
               variant: str = "grad") -> Array:
    """sigma = lambda + mean_i ||J_phi(x_i)||_F^2 (+ mean_i ||phi(x_i)||^2).

    Args:
      grad_sq_norms: (m,) per-real-sample squared Frobenius norms of the
        critic-feature Jacobian w.r.t. the input image.
      value_sq_norms: (m,) per-sample ||phi(x)||^2, used by the
        'value_and_grad' variant.
      scaling_coeff: lambda.
      variant: 'grad' | 'value_and_grad'.
    """
    sigma = scaling_coeff + jnp.mean(grad_sq_norms)
    if variant == "value_and_grad":
        if value_sq_norms is None:
            raise ValueError("value_and_grad scaling needs value_sq_norms")
        sigma = sigma + jnp.mean(value_sq_norms)
    return sigma
