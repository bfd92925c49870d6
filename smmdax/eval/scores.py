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
