"""Score math: Frechet distance, polynomial-kernel MMD (KID), IS.

Math sources: Heusel et al. 2017 (FID), Binkowski et al. 2018
arXiv:1801.01401 (KID — this reference lineage is its original
implementation, SURVEY.md #10), Salimans et al. 2016 (IS).

FID (one eigendecomposition) runs on host numpy.  The subset-averaged
statistics — KID and both three-sample tests — are matmul-dominated
(hundreds of m x m polynomial Gram blocks per scoring event) and
dispatch to a jitted device sweep when JAX's default backend is an
accelerator (``backend="auto"``).  Measured at the reference scoring
geometry (25k x 2048-d features, 50x1000 subsets for KID + the
relative-MMD test): 28.3 s host f64 numpy per scoring event vs 6.5 s
on the TPU with the static sets device-cached (the trainer's
``_score_feats``) — upload of the changing fake set dominates the
device arm, so callers should keep static feature sets resident.  The
numpy arm (f64) remains the oracle — both arms draw IDENTICAL subset
indices from the same RNG sequence and share one set of statistic
formulas (written numpy/jnp-generically), so they differ only by f32
Gram arithmetic; a parity test pins them together.  ``sqrtm`` of the
covariance product is computed by eigendecomposition of the symmetrized
product S1^(1/2) S2 S1^(1/2) — no scipy needed, numerically stable for
the near-singular covariances Inception features produce.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

Array = np.ndarray


def gaussian_stats(feats: Array) -> Tuple[Array, Array]:
    """(mean, covariance) of a (N, d) feature matrix, as f64 numpy.

    Device-resident features compute the O(N d^2) covariance matmul on
    the accelerator (two-pass centered form, f32 Precision.HIGHEST —
    centering first keeps the f32 product well-conditioned) and fetch
    only the O(d^2) statistics: at the reference geometry that is
    17 MB over the host link instead of the 200 MB feature matrix.
    Host numpy inputs keep the f64 oracle path."""
    try:
        import jax
        is_dev = isinstance(feats, jax.Array)
    except Exception:                                # pragma: no cover
        is_dev = False
    if is_dev:
        import jax.numpy as jnp
        x = jnp.asarray(feats, jnp.float32)
        mu = jnp.mean(x, axis=0)
        xc = x - mu
        sigma = jnp.matmul(xc.T, xc,
                           precision=jax.lax.Precision.HIGHEST) / (len(x) - 1)
        return (np.asarray(mu, np.float64), np.asarray(sigma, np.float64))
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


_ROOT_CACHE: dict = {}     # id(sigma) -> (sigma ref, sigma^(1/2))


def _sqrt_eigvals_of_product(s1: Array, s2: Array, eps: float = 1e-10) -> Array:
    """Eigenvalues of sqrtm(s1 @ s2) via the PSD-symmetrized form.

    s1's root is cached (single slot, keyed on array identity with a
    strong reference so ids can't be recycled): the trainer scores a
    FIXED real set every event, and re-eigendecomposing the unchanging
    2048x2048 real covariance was roughly half the per-event FID host
    cost.  Callers must not mutate sigma in place."""
    ent = _ROOT_CACHE.get(id(s1))
    if ent is not None and ent[0] is s1:
        root1 = ent[1]
    else:
        w1, v1 = np.linalg.eigh(s1)
        w1 = np.clip(w1, 0.0, None)
        root1 = (v1 * np.sqrt(w1)) @ v1.T       # s1^(1/2)
        _ROOT_CACHE.clear()
        _ROOT_CACHE[id(s1)] = (s1, root1)
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


# ---------------------------------------------------------------------------
# Device fast path for the subset sweeps
#
# KID and the three-sample tests average statistics over dozens of
# random subsets; each subset costs several m x m polynomial Gram
# blocks.  In f64 numpy that is ~28 s per scoring event at the
# reference geometry (25k x 2048-d, 50x1000 subsets x 2 statistics,
# measured on this host — enough to stall training at the reference's
# score_every=2000 cadence).  The device path runs the Gram blocks on
# the accelerator (f32, Precision.HIGHEST) and fetches only O(m)
# sufficient statistics per subset; all cancellation-sensitive
# finishing math (U-statistic means, zeta covariance terms) stays in
# f64 on host.  Both arms draw identical subset indices; a parity test
# (tests/test_eval.py) pins the arms together.
# ---------------------------------------------------------------------------


def _resolve_backend(backend: str) -> str:
    """'auto' -> 'jax' when JAX's default backend is an accelerator
    (the training device), else 'numpy'."""
    if backend == "auto":
        try:
            import jax
            return "jax" if jax.default_backend() != "cpu" else "numpy"
        except Exception:                            # pragma: no cover
            return "numpy"
    if backend not in ("numpy", "jax"):
        raise ValueError(f"backend must be auto|numpy|jax, got {backend!r}")
    return backend


def use_device_scoring() -> bool:
    """True when ``backend="auto"`` resolves to the device sweep (the
    default JAX backend is an accelerator) — the single public switch
    every scoring caller keys device-residency decisions on (feature
    ``fetch=False``, device caches)."""
    return _resolve_backend("auto") == "jax"


def _gram_dev(a, b):
    """KID polynomial kernel block on device (f32 MXU matmul)."""
    import jax
    import jax.numpy as jnp
    d = a.shape[-1]
    prod = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return (prod / d + 1.0) ** 3


def _kid_scan(real, fake, idx_r, idx_f):
    """Per-subset (sum k_xx offdiag, sum k_yy offdiag, sum k_xy)."""
    import jax
    import jax.numpy as jnp

    def one(carry, ix_iy):
        ix, iy = ix_iy
        x, y = real[ix], fake[iy]
        k_xx, k_yy, k_xy = _gram_dev(x, x), _gram_dev(y, y), _gram_dev(x, y)
        return carry, (k_xx.sum() - jnp.trace(k_xx),
                       k_yy.sum() - jnp.trace(k_yy), k_xy.sum())

    return jax.lax.scan(one, 0, (idx_r, idx_f))[1]


def _vote_scan(ref, a, b, idx_x, idx_y, idx_z):
    """Per-subset sums for MMD^2(r,a) and MMD^2(r,b) with a shared
    k_rr block (the numpy arm computes k_rr twice; same value)."""
    import jax
    import jax.numpy as jnp

    def one(carry, idx):
        ix, iy, iz = idx
        r, ya, yb = ref[ix], a[iy], b[iz]
        k_rr = _gram_dev(r, r)
        s_rr = k_rr.sum() - jnp.trace(k_rr)
        k_aa, k_bb = _gram_dev(ya, ya), _gram_dev(yb, yb)
        return carry, (s_rr,
                       k_aa.sum() - jnp.trace(k_aa), _gram_dev(r, ya).sum(),
                       k_bb.sum() - jnp.trace(k_bb), _gram_dev(r, yb).sum())

    return jax.lax.scan(one, 0, (idx_x, idx_y, idx_z))[1]


def _rel_scan(ref, a, b, idx_x, idx_y, idx_z):
    """Per-subset O(m) sufficient statistics for the Bounliphone
    diff/variance: block sums, row/col sums, and (h^2).sum()."""
    import jax
    import jax.numpy as jnp

    def one(carry, idx):
        ix, iy, iz = idx
        x, y, z = ref[ix], a[iy], b[iz]
        k_yy = _gram_dev(y, y)
        k_zz = _gram_dev(z, z)
        k_xy = _gram_dev(x, y)
        k_xz = _gram_dev(x, z)
        k_yy_nd = k_yy - jnp.diag(jnp.diagonal(k_yy))
        k_zz_nd = k_zz - jnp.diag(jnp.diagonal(k_zz))
        h = k_yy_nd - k_zz_nd - k_xy.T - k_xy + k_xz + k_xz.T
        return carry, (k_yy_nd.sum(), k_zz_nd.sum(),
                       k_xy.sum(), k_xz.sum(),
                       k_yy_nd.sum(axis=0), k_zz_nd.sum(axis=0),
                       k_xy.sum(axis=1), k_xz.sum(axis=1),
                       k_xy.sum(axis=0), k_xz.sum(axis=0),
                       (h ** 2).sum())

    return jax.lax.scan(one, 0, (idx_x, idx_y, idx_z))[1]


_JITTED = {}


def _jitted(fn):
    import jax
    if fn.__name__ not in _JITTED:
        _JITTED[fn.__name__] = jax.jit(fn)
    return _JITTED[fn.__name__]


def _to_dev(feats):
    import jax
    import jax.numpy as jnp
    if isinstance(feats, jax.Array):
        # already device-resident (e.g. the trainer's cached static
        # feature sets): no host round-trip — jnp.asarray is a no-op
        # when the dtype already matches
        return jnp.asarray(feats, jnp.float32)
    return jnp.asarray(np.asarray(feats), jnp.float32)


def _stack_idx(draws) -> "np.ndarray":
    return np.stack(draws).astype(np.int32)


def kid_from_features(feats_real: Array, feats_fake: Array,
                      subset_size: int = 1000, n_subsets: int = 50,
                      seed: int = 0, backend: str = "auto") -> Tuple[float, float]:
    """KID: polynomial MMD^2 averaged over random subsets (the
    reference's ``polynomial_mmd_averages``).  Returns (mean, std)."""
    rng = np.random.default_rng(seed)
    m = min(subset_size, len(feats_real), len(feats_fake))
    idx_r, idx_f = [], []
    for _ in range(n_subsets):
        idx_r.append(rng.choice(len(feats_real), m, replace=False))
        idx_f.append(rng.choice(len(feats_fake), m, replace=False))
    if _resolve_backend(backend) == "jax":
        s_xx, s_yy, s_xy = _jitted(_kid_scan)(
            _to_dev(feats_real), _to_dev(feats_fake),
            _stack_idx(idx_r), _stack_idx(idx_f))
        s_xx = np.asarray(s_xx, np.float64)
        s_yy = np.asarray(s_yy, np.float64)
        s_xy = np.asarray(s_xy, np.float64)
        vals = (s_xx / (m * (m - 1)) + s_yy / (m * (m - 1))
                - 2.0 * s_xy / (m * m))
    else:
        vals = np.empty(n_subsets)
        for i in range(n_subsets):
            vals[i] = polynomial_mmd(feats_real[idx_r[i]],
                                     feats_fake[idx_f[i]])
    return float(vals.mean()), float(vals.std())


def inception_score(probs: Array, n_splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over class-probability rows.

    Device-resident probs stay on device (f32; the formula is a mean
    of logs of softmax outputs — no cancellation hazard) and only the
    per-split scalars come back to host; numpy inputs keep f64."""
    try:
        import jax
        is_dev = isinstance(probs, jax.Array)
    except Exception:                                # pragma: no cover
        is_dev = False
    if is_dev:
        import jax.numpy as xp
    else:
        xp = np
        probs = np.asarray(probs, np.float64)
    scores = []
    n = len(probs)
    for i in range(n_splits):
        part = probs[i * n // n_splits:(i + 1) * n // n_splits]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (xp.log(part + 1e-12) - xp.log(py + 1e-12))
        scores.append(xp.exp(kl.sum(axis=1).mean()))
    if is_dev:
        scores = xp.stack(scores)           # one fetch, not n_splits
    scores = np.asarray(scores, np.float64)
    return float(scores.mean()), float(scores.std())


def _norm_cdf(x: float) -> float:
    """Standard normal CDF via erf (no scipy dependency)."""
    import math
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _chi2_sf_even_dof(x: float, dof: int) -> float:
    """Survival function of chi-square with EVEN dof (no scipy): for
    dof = 2k the chi-square is Erlang(k, 1/2), whose sf has the exact
    closed form exp(-x/2) * sum_{i<k} (x/2)^i / i!.  Computed in log
    space so huge Fisher statistics (many tiny p-values) don't
    overflow the h^i terms."""
    k = dof // 2
    if k < 1:
        raise ValueError(f"even dof >= 2 required, got {dof}")
    h = x / 2.0
    if h <= 0.0:
        return 1.0
    logs = [0.0]
    for i in range(1, k):
        logs.append(logs[-1] + np.log(h) - np.log(i))
    mx = max(logs)
    sf = float(np.exp(mx - h) * sum(np.exp(l - mx) for l in logs))
    return min(1.0, max(0.0, sf))


def fisher_combine(ps) -> float:
    """Fisher's method: X = -2 sum ln(p_i) ~ chi^2(2k) under H0 and
    independence.  Subset draws from the same feature pools are
    positively dependent, so the combined value is ANTI-conservative
    (rejects somewhat more often than its nominal level) — calibrated
    empirically in tests/test_eval.py; the scheduler's default is a
    single large-m test, which needs no combination at all."""
    ps = [min(1.0, max(float(p), 1e-15)) for p in ps]
    x = -2.0 * float(np.sum(np.log(ps)))
    return _chi2_sf_even_dof(x, 2 * len(ps))


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
    return _rel_finish(_rel_primitives(k_yy, k_zz, k_xy, k_xz), m, n, r)[1]


def _rel_primitives(k_yy, k_zz, k_xy, k_xz) -> tuple:
    """The 11 sufficient statistics of the Bounliphone test from the
    four dense Gram blocks — ONE definition shared by mmd_diff_var and
    the numpy subset arm so the statistic cannot drift between the
    oracle and its callers (the device arm's _rel_scan mirrors this
    tuple and is parity-tested against it)."""
    k_yy_nd = k_yy - np.diag(np.diagonal(k_yy))
    k_zz_nd = k_zz - np.diag(np.diagonal(k_zz))
    h = k_yy_nd - k_zz_nd - k_xy.T - k_xy + k_xz + k_xz.T
    return (k_yy_nd.sum(), k_zz_nd.sum(), k_xy.sum(), k_xz.sum(),
            k_yy_nd.sum(axis=0), k_zz_nd.sum(axis=0),
            k_xy.sum(axis=1), k_xz.sum(axis=1),
            k_xy.sum(axis=0), k_xz.sum(axis=0),
            (h ** 2).sum())


def _rel_finish(prim, m: int, n: int, r: int) -> Tuple[float, float]:
    """f64 host finishing of the Bounliphone (diff, variance) from the
    O(m) sufficient statistics of the four Gram blocks (the _rel_scan /
    mmd_diff_var primitives tuple).

    Every Frobenius-sum of a matrix product in the textbook zeta_1
    form collapses to an inner product of row/column sums —
    sum_{k,l} (A^T B)_{kl} = sum_i rowsum_i(A) rowsum_i(B) — so given
    the primitives the statistic is O(m), and the O(m^2)/O(m^3) Gram
    work can run wherever it is cheapest (device or host) while the
    cancellation-sensitive moment differences stay in f64 here.
    """
    (s_yy, s_zz, s_xy, s_xz, ry, rz, rx_y, rx_z, cy, cz, h2) = [
        np.asarray(p, np.float64) for p in prim]

    u_yy = float(s_yy) / (n * (n - 1))
    u_zz = float(s_zz) / (r * (r - 1))
    u_xy = float(s_xy) / (m * n)
    u_xz = float(s_xz) / (m * r)

    # zeta_1 pieces: variances of the conditional expectations of each
    # U-statistic kernel, then the covariances from the shared X sample
    t1 = (1.0 / n ** 3) * (ry @ ry) - u_yy ** 2
    t2 = (1.0 / (n ** 2 * m)) * (rx_y @ rx_y) - u_xy ** 2
    t3 = (1.0 / (n * m ** 2)) * (cy @ cy) - u_xy ** 2
    t4 = (1.0 / r ** 3) * (rz @ rz) - u_zz ** 2
    t5 = (1.0 / (r * m ** 2)) * (cz @ cz) - u_xz ** 2
    t6 = (1.0 / (r ** 2 * m)) * (rx_z @ rx_z) - u_xz ** 2
    t7 = (1.0 / (n ** 2 * m)) * (ry @ cy) - u_yy * u_xy
    t8 = (1.0 / (n * m * r)) * (rx_y @ rx_z) - u_xy * u_xz
    t9 = (1.0 / (r ** 2 * m)) * (rz @ cz) - u_zz * u_xz

    zeta1 = t1 + t2 + t3 + t4 + t5 + t6 - 2.0 * (t7 + t8 + t9)

    # zeta_2: variance of the full second-order U-statistic kernel
    # h((x_i,y_i,z_i),(x_j,y_j,z_j)) (equal sizes only)
    diff = (u_zz - 2.0 * u_xz) - (u_yy - 2.0 * u_xy)
    zeta2 = (1.0 / (m * (m - 1))) * float(h2) - diff ** 2

    var = (4.0 * (m - 2) / (m * (m - 1))) * zeta1 \
        + (2.0 / (m * (m - 1))) * zeta2
    return float(diff), float(var)


def relative_mmd_test(feats_ref: Array, feats_a: Array, feats_b: Array,
                      subset_size: int = 1000, n_subsets: int = 10,
                      seed: int = 0, backend: str = "auto",
                      combine: str = "fisher") -> Tuple[float, float]:
    """Bounliphone et al. relative-MMD three-sample hypothesis test
    (the lineage's actual scheduler mechanism, SURVEY.md §2.11
    [R-MED]) with the KID polynomial kernel.

    Statistic: t = [MMD^2_u(ref, B) - MMD^2_u(ref, A)] / sqrt(Var),
    where Var is the shared-X asymptotic variance (mmd_diff_var) and
    the ref-ref block cancels in the difference.  t > 0 favors A.
    Returns ``(p_value, t)`` where ``p_value = P(observing a t this
    large under H0: A is no closer than B)`` — SMALL p means candidate
    A (current samples) is SIGNIFICANTLY closer to the reference than
    B (best-snapshot samples).

    With ``n_subsets == 1`` this is ONE hypothesis test at size
    ``subset_size`` and the returned p-value is exactly calibrated
    (H0 rejection rate == alpha; pinned by the calibration test).
    With several subsets the per-subset p-values are combined by
    ``combine``:

    * ``fisher`` (default) — Fisher's method; a real combined p-value
      under independence, ANTI-conservative here because subsets
      overlap (positively dependent statistics).
    * ``mean`` — the pre-round-4 behavior: the mean of dependent
      p-values, NOT a calibrated p-value (kept for reproducing old
      runs; its threshold has no interpretable significance level).

    The returned t is always the subset-mean of the t statistics.
    """
    if combine not in ("fisher", "mean"):
        # validate before any Gram work — the subsets cost O(n·m²)
        raise ValueError(f"combine must be fisher or mean, got {combine!r}")
    m = min(subset_size, len(feats_ref), len(feats_a), len(feats_b))
    rng = np.random.default_rng(seed)
    idx_x, idx_y, idx_z = [], [], []
    for _ in range(n_subsets):
        idx_x.append(rng.choice(len(feats_ref), m, replace=False))
        idx_y.append(rng.choice(len(feats_a), m, replace=False))
        idx_z.append(rng.choice(len(feats_b), m, replace=False))

    if _resolve_backend(backend) == "jax":
        # Gram blocks + O(m) reductions on device (f32), per-subset
        # stacked; the moment differences finish in f64 on host
        prims = _jitted(_rel_scan)(
            _to_dev(feats_ref), _to_dev(feats_a), _to_dev(feats_b),
            _stack_idx(idx_x), _stack_idx(idx_y), _stack_idx(idx_z))
        prims = [np.asarray(p, np.float64) for p in prims]
        stats = [_rel_finish([p[i] for p in prims], m, m, m)
                 for i in range(n_subsets)]
    else:
        stats = []
        for i in range(n_subsets):
            x = feats_ref[idx_x[i]]
            y = feats_a[idx_y[i]]
            z = feats_b[idx_z[i]]
            stats.append(_rel_finish(_rel_primitives(
                _poly_kernel(y, y), _poly_kernel(z, z),
                _poly_kernel(x, y), _poly_kernel(x, z)), m, m, m))

    ps, ts = [], []
    # diff = MMD^2(X,Z) - MMD^2(X,Y): positive favors A (= Y, the
    # current samples); the common K_XX term cancels in the difference
    for diff, var in stats:
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
    if combine == "fisher" and len(ps) > 1:
        return fisher_combine(ps), float(np.mean(ts))
    return float(np.mean(ps)), float(np.mean(ts))


def relative_similarity_test(feats_ref: Array, feats_a: Array, feats_b: Array,
                             subset_size: int = 1000, n_subsets: int = 10,
                             seed: int = 0, backend: str = "auto") -> float:
    """Three-sample test statistic for the KID LR scheduler (SURVEY.md
    component #11, from Demystifying MMD GANs §5): fraction of subset
    draws where candidate A (current samples) is CLOSER to the
    reference than B (best-checkpoint samples).  > 0.5 means A improved
    on B."""
    rng = np.random.default_rng(seed)
    m = min(subset_size, len(feats_ref), len(feats_a), len(feats_b))
    idx_x, idx_y, idx_z = [], [], []
    for _ in range(n_subsets):
        idx_x.append(rng.choice(len(feats_ref), m, replace=False))
        idx_y.append(rng.choice(len(feats_a), m, replace=False))
        idx_z.append(rng.choice(len(feats_b), m, replace=False))
    if _resolve_backend(backend) == "jax":
        s_rr, s_aa, s_ra, s_bb, s_rb = [
            np.asarray(s, np.float64) for s in _jitted(_vote_scan)(
                _to_dev(feats_ref), _to_dev(feats_a), _to_dev(feats_b),
                _stack_idx(idx_x), _stack_idx(idx_y), _stack_idx(idx_z))]
        off = m * (m - 1)
        mmd_a = s_rr / off + s_aa / off - 2.0 * s_ra / (m * m)
        mmd_b = s_rr / off + s_bb / off - 2.0 * s_rb / (m * m)
        return float((mmd_a < mmd_b).mean())
    wins = 0
    for i in range(n_subsets):
        r = feats_ref[idx_x[i]]
        a = feats_a[idx_y[i]]
        b = feats_b[idx_z[i]]
        if polynomial_mmd(r, a) < polynomial_mmd(r, b):
            wins += 1
    return wins / n_subsets
