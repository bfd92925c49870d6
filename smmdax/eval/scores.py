"""Score math: Frechet distance, polynomial-kernel MMD (KID), IS.

Math sources: Heusel et al. 2017 (FID), Binkowski et al. 2018
arXiv:1801.01401 (KID — this reference lineage is its original
implementation, SURVEY.md #10), Salimans et al. 2016 (IS).

All of this runs on host-side feature arrays (numpy): scoring is
offline/interval work, not the hot path; the device work is the
feature extraction (smmdax.eval.features).  ``sqrtm`` of the covariance
product is computed by eigendecomposition of the symmetrized product
S1^(1/2) S2 S1^(1/2) — no scipy needed, numerically stable for the
near-singular covariances Inception features produce.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

Array = np.ndarray


def gaussian_stats(feats: Array) -> Tuple[Array, Array]:
    """(mean, covariance) of a (N, d) feature matrix."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def _sqrt_eigvals_of_product(s1: Array, s2: Array, eps: float = 1e-10) -> Array:
    """Eigenvalues of sqrtm(s1 @ s2) via the PSD-symmetrized form."""
    w1, v1 = np.linalg.eigh(s1)
    w1 = np.clip(w1, 0.0, None)
    root1 = (v1 * np.sqrt(w1)) @ v1.T           # s1^(1/2)
    m = root1 @ s2 @ root1                       # PSD, similar to s1 s2
    w = np.linalg.eigvalsh(m)
    return np.sqrt(np.clip(w, 0.0, None))


def frechet_distance(mu1: Array, sigma1: Array,
                     mu2: Array, sigma2: Array) -> float:
    """||mu1-mu2||^2 + tr(s1 + s2 - 2 sqrtm(s1 s2))."""
    diff = mu1 - mu2
    covmean_trace = float(np.sum(_sqrt_eigvals_of_product(sigma1, sigma2)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * covmean_trace)


def fid_from_features(feats_real: Array, feats_fake: Array) -> float:
    mu1, s1 = gaussian_stats(feats_real)
    mu2, s2 = gaussian_stats(feats_fake)
    return frechet_distance(mu1, s1, mu2, s2)


def polynomial_mmd(x: Array, y: Array, degree: int = 3, gamma: Optional[float] = None,
                   coef0: float = 1.0) -> float:
    """Unbiased MMD^2 with k(a,b) = (gamma a.b + coef0)^degree
    (gamma defaults to 1/d — the KID kernel)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    d = x.shape[1]
    g = (1.0 / d) if gamma is None else gamma
    k_xx = (g * (x @ x.T) + coef0) ** degree
    k_yy = (g * (y @ y.T) + coef0) ** degree
    k_xy = (g * (x @ y.T) + coef0) ** degree
    m, n = len(x), len(y)
    sum_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    sum_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    sum_xy = k_xy.mean()
    return float(sum_xx + sum_yy - 2.0 * sum_xy)


def kid_from_features(feats_real: Array, feats_fake: Array,
                      subset_size: int = 1000, n_subsets: int = 50,
                      seed: int = 0) -> Tuple[float, float]:
    """KID: polynomial MMD^2 averaged over random subsets (the
    reference's ``polynomial_mmd_averages``).  Returns (mean, std)."""
    rng = np.random.default_rng(seed)
    m = min(subset_size, len(feats_real), len(feats_fake))
    vals = np.empty(n_subsets)
    for i in range(n_subsets):
        xi = feats_real[rng.choice(len(feats_real), m, replace=False)]
        yi = feats_fake[rng.choice(len(feats_fake), m, replace=False)]
        vals[i] = polynomial_mmd(xi, yi)
    return float(vals.mean()), float(vals.std())


def inception_score(probs: Array, n_splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over class-probability rows."""
    probs = np.asarray(probs, np.float64)
    scores = []
    n = len(probs)
    for i in range(n_splits):
        part = probs[i * n // n_splits:(i + 1) * n // n_splits]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def _norm_cdf(x: float) -> float:
    """Standard normal CDF via erf (no scipy dependency)."""
    import math
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _poly_kernel(x: Array, y: Array, degree: int = 3,
                 gamma: Optional[float] = None, coef0: float = 1.0) -> Array:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    g = (1.0 / x.shape[1]) if gamma is None else gamma
    return (g * (x @ y.T) + coef0) ** degree


def mmd_diff_var(k_yy: Array, k_zz: Array, k_xy: Array, k_xz: Array) -> float:
    """Variance of MMD^2_u(X,Y) - MMD^2_u(X,Z) under the shared-X
    coupling — Bounliphone et al., "A Test of Relative Similarity for
    Model Selection in Generative Models", ICLR 2016 (arXiv:1511.04581):
    the leading 4 zeta_1 covariance built from the three kernel blocks
    (including the CROSS-covariance terms t7..t9 the shared reference
    sample induces) plus the second-order 2 zeta_2 term.  zeta_1 alone
    is a signed combination of empirical moments that can come out
    ~zero (or slightly negative) exactly when the two candidates are
    similar — the regime the LR scheduler tests — while the
    mean-of-squares-shaped zeta_2 keeps the full estimate positive
    there, so the complete estimator is used.

    X is the reference sample; Y, Z the two model samples; all three
    the same size m (the test is defined for equal sizes).
    """
    m = k_xy.shape[0]
    n = k_yy.shape[0]
    r = k_zz.shape[0]
    k_yy_nd = k_yy - np.diag(np.diagonal(k_yy))
    k_zz_nd = k_zz - np.diag(np.diagonal(k_zz))

    u_yy = k_yy_nd.sum() / (n * (n - 1))
    u_zz = k_zz_nd.sum() / (r * (r - 1))
    u_xy = k_xy.sum() / (m * n)
    u_xz = k_xz.sum() / (m * r)

    # zeta_1 pieces: variances of the conditional expectations of each
    # U-statistic kernel (row-sum inner products), then the covariances
    # from the shared X sample
    t1 = (1.0 / n ** 3) * (k_yy_nd.T @ k_yy_nd).sum() - u_yy ** 2
    t2 = (1.0 / (n ** 2 * m)) * (k_xy.T @ k_xy).sum() - u_xy ** 2
    t3 = (1.0 / (n * m ** 2)) * (k_xy @ k_xy.T).sum() - u_xy ** 2
    t4 = (1.0 / r ** 3) * (k_zz_nd.T @ k_zz_nd).sum() - u_zz ** 2
    t5 = (1.0 / (r * m ** 2)) * (k_xz @ k_xz.T).sum() - u_xz ** 2
    t6 = (1.0 / (r ** 2 * m)) * (k_xz.T @ k_xz).sum() - u_xz ** 2
    t7 = (1.0 / (n ** 2 * m)) * (k_yy_nd @ k_xy.T).sum() - u_yy * u_xy
    t8 = (1.0 / (n * m * r)) * (k_xy.T @ k_xz).sum() - u_xy * u_xz
    t9 = (1.0 / (r ** 2 * m)) * (k_zz_nd @ k_xz.T).sum() - u_zz * u_xz

    zeta1 = t1 + t2 + t3 + t4 + t5 + t6 - 2.0 * (t7 + t8 + t9)

    # zeta_2: variance of the full second-order U-statistic kernel
    # h((x_i,y_i,z_i),(x_j,y_j,z_j)) (equal sizes only)
    h = k_yy_nd - k_zz_nd - k_xy.T - k_xy + k_xz + k_xz.T
    zeta2 = (1.0 / (m * (m - 1))) * (h ** 2).sum() \
        - ((u_yy - 2.0 * u_xy) - (u_zz - 2.0 * u_xz)) ** 2

    return (4.0 * (m - 2) / (m * (m - 1))) * zeta1 \
        + (2.0 / (m * (m - 1))) * zeta2


def relative_mmd_test(feats_ref: Array, feats_a: Array, feats_b: Array,
                      subset_size: int = 1000, n_subsets: int = 10,
                      seed: int = 0) -> Tuple[float, float]:
    """Bounliphone et al. relative-MMD three-sample hypothesis test
    (the lineage's actual scheduler mechanism, SURVEY.md §2.11
    [R-MED]) with the KID polynomial kernel.

    Statistic: t = [MMD^2_u(ref, B) - MMD^2_u(ref, A)] / sqrt(Var),
    where Var is the shared-X asymptotic variance (mmd_diff_var) and
    the ref-ref block cancels in the difference.  t > 0 favors A.
    Returns ``(p_value, t)`` where ``p_value = P(observing a t this
    large under H0: A is no closer than B)`` — SMALL p means candidate
    A (current samples) is SIGNIFICANTLY closer to the reference than
    B (best-snapshot samples).  Averaged over ``n_subsets`` subset
    draws like KID itself (seed the caller's step for independence
    across scoring events).
    """
    m = min(subset_size, len(feats_ref), len(feats_a), len(feats_b))
    rng = np.random.default_rng(seed)
    ps, ts = [], []
    for _ in range(n_subsets):
        x = feats_ref[rng.choice(len(feats_ref), m, replace=False)]
        y = feats_a[rng.choice(len(feats_a), m, replace=False)]
        z = feats_b[rng.choice(len(feats_b), m, replace=False)]
        k_yy = _poly_kernel(y, y)
        k_zz = _poly_kernel(z, z)
        k_xy = _poly_kernel(x, y)
        k_xz = _poly_kernel(x, z)
        u_yy = (k_yy.sum() - np.trace(k_yy)) / (m * (m - 1))
        u_zz = (k_zz.sum() - np.trace(k_zz)) / (m * (m - 1))
        u_xy = k_xy.mean()
        u_xz = k_xz.mean()
        # MMD^2(X,Z) - MMD^2(X,Y): positive favors A (= Y, the current
        # samples); the common K_XX term cancels in the difference
        diff = (u_zz - 2.0 * u_xz) - (u_yy - 2.0 * u_xy)
        var = mmd_diff_var(k_yy, k_zz, k_xy, k_xz)
        if var <= 1e-12:
            # degenerate variance estimate (candidates numerically
            # indistinguishable): inconclusive, not infinitely
            # significant — never divide by the clamp floor
            ts.append(0.0)
            ps.append(0.5)
            continue
        t = float(diff / np.sqrt(var))
        ts.append(t)
        ps.append(1.0 - _norm_cdf(t))
    return float(np.mean(ps)), float(np.mean(ts))


def relative_similarity_test(feats_ref: Array, feats_a: Array, feats_b: Array,
                             subset_size: int = 1000, n_subsets: int = 10,
                             seed: int = 0) -> float:
    """Three-sample test statistic for the KID LR scheduler (SURVEY.md
    component #11, from Demystifying MMD GANs §5): fraction of subset
    draws where candidate A (current samples) is CLOSER to the
    reference than B (best-checkpoint samples).  > 0.5 means A improved
    on B."""
    rng = np.random.default_rng(seed)
    m = min(subset_size, len(feats_ref), len(feats_a), len(feats_b))
    wins = 0
    for _ in range(n_subsets):
        r = feats_ref[rng.choice(len(feats_ref), m, replace=False)]
        a = feats_a[rng.choice(len(feats_a), m, replace=False)]
        b = feats_b[rng.choice(len(feats_b), m, replace=False)]
        if polynomial_mmd(r, a) < polynomial_mmd(r, b):
            wins += 1
    return wins / n_subsets
