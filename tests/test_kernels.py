"""Golden tests: jnp kernel/MMD math vs independent numpy implementations
and closed-form properties (SURVEY.md §4: the reference ships no tests;
this suite is built from the papers' math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smmdax.kernels import (
    sq_dists, mix_rbf_kernel, mix_rq_kernel, dot_kernel, distance_kernel,
    kernel_matrices, mmd2, mmd2_and_ratio, mmd2_and_variance,
)
from smmdax.kernels.mmd import mmd_sums, mmd2_from_sums

RNG = np.random.RandomState(0)


def _np_sq_dists(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def _np_rbf(x, y, sigmas):
    d2 = _np_sq_dists(x, y)
    return sum(np.exp(-d2 / (2.0 * s * s)) for s in sigmas)


def _np_rq(x, y, alphas):
    d2 = _np_sq_dists(x, y)
    return sum((1.0 + d2 / (2.0 * a)) ** (-a) for a in alphas)


def _np_mmd2_unbiased(kxx, kxy, kyy):
    m, n = kxx.shape[0], kyy.shape[0]
    return ((kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
            - 2 * kxy.sum() / (m * n))


@pytest.fixture(scope="module")
def feats():
    x = RNG.randn(17, 12).astype(np.float32)
    y = (RNG.randn(23, 12) * 1.5 + 0.3).astype(np.float32)
    return x, y


def test_sq_dists_matches_numpy(feats):
    x, y = feats
    got = np.asarray(sq_dists(jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(got, _np_sq_dists(x, y), rtol=2e-5, atol=2e-4)


def test_sq_dists_self_diag_zero(feats):
    x, _ = feats
    d2 = np.asarray(sq_dists(jnp.array(x), jnp.array(x)))
    assert np.all(np.abs(np.diag(d2)) < 1e-3)
    assert np.all(d2 >= 0)


def test_rbf_mixture_matches_numpy(feats):
    x, y = feats
    sigmas = (1.0, 2.0, 4.0, 8.0, 16.0)
    b = mix_rbf_kernel(jnp.array(x), jnp.array(y), sigmas=sigmas)
    np.testing.assert_allclose(np.asarray(b.k_xy), _np_rbf(x, y, sigmas),
                               rtol=1e-5, atol=1e-5)
    assert b.k_diag == pytest.approx(len(sigmas))


def test_rq_mixture_matches_numpy(feats):
    x, y = feats
    alphas = (0.2, 0.5, 1.0, 2.0, 5.0)
    b = mix_rq_kernel(jnp.array(x), jnp.array(y), alphas=alphas)
    np.testing.assert_allclose(np.asarray(b.k_xy), _np_rq(x, y, alphas),
                               rtol=1e-5, atol=1e-5)
    assert b.k_diag == pytest.approx(len(alphas))


def test_dot_and_distance_kernels(feats):
    x, y = feats
    b = dot_kernel(jnp.array(x), jnp.array(y))
    np.testing.assert_allclose(np.asarray(b.k_xy), x @ y.T, rtol=1e-5, atol=1e-4)
    b = distance_kernel(jnp.array(x), jnp.array(y))
    np.testing.assert_allclose(np.asarray(b.k_xy),
                               -np.sqrt(_np_sq_dists(x, y) + 1e-8),
                               rtol=1e-4, atol=1e-4)
    assert b.k_diag == pytest.approx(-1e-4)


@pytest.mark.parametrize("kernel", ["gaussian", "rq", "dot", "distance"])
def test_mmd2_unbiased_matches_numpy(feats, kernel):
    x, y = feats
    b = kernel_matrices(kernel, jnp.array(x), jnp.array(y))
    want = _np_mmd2_unbiased(np.asarray(b.k_xx), np.asarray(b.k_xy),
                             np.asarray(b.k_yy))
    got = float(mmd2(b))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_mmd2_biased_nonnegative_and_zero_on_self(feats):
    x, _ = feats
    b = kernel_matrices("gaussian", jnp.array(x), jnp.array(x))
    assert float(mmd2(b, biased=True)) == pytest.approx(0.0, abs=1e-4)
    # biased V-statistic is >= 0 for PSD kernels
    y = jnp.array(RNG.randn(17, 12).astype(np.float32) + 2.0)
    b2 = kernel_matrices("gaussian", jnp.array(x), y)
    assert float(mmd2(b2, biased=True)) >= 0.0


def test_mmd2_same_distribution_near_zero():
    # E[MMD^2_u] = 0 under H0 — average over draws should be ~0.
    key = jax.random.PRNGKey(0)
    vals = []
    for i in range(20):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (64, 8))
        y = jax.random.normal(k2, (64, 8))
        vals.append(float(mmd2(kernel_matrices("rq", x, y))))
    assert abs(np.mean(vals)) < 5e-3


def test_mmd_sums_additivity(feats):
    """Row-block partial sums add to the full estimate — the property the
    ring/data-parallel estimator relies on (SURVEY.md §7 hard-part #3)."""
    x, y = feats
    x, y = x[:16], y[:16]
    full = kernel_matrices("rq", jnp.array(x), jnp.array(y))
    want = float(mmd2(full))

    # split x rows into two shards; each shard computes its block-rows
    total = None
    for sl in (slice(0, 8), slice(8, 16)):
        xs = jnp.array(x[sl])
        k_xx_rows = mix_rq_kernel(xs, jnp.array(x)).k_xy  # (8,16) rows of K_XX
        k_xy_rows = mix_rq_kernel(xs, jnp.array(y)).k_xy
        k_yy_rows = mix_rq_kernel(jnp.array(y[sl]), jnp.array(y)).k_xy
        from smmdax.kernels.mmd import MMDSums
        part = MMDSums(
            jnp.sum(k_xx_rows) - 8 * 5.0,   # strip this shard's diagonal hits
            jnp.sum(k_yy_rows) - 8 * 5.0,
            jnp.sum(k_xy_rows),
            jnp.asarray(16.0), jnp.asarray(16.0))
        total = part if total is None else total + part
    got = float(mmd2_from_sums(total))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_variance_estimator_matches_bruteforce():
    """Check the Sutherland variance formula against a brute-force O(m^3)
    numpy evaluation of the same closed form on a small m."""
    m, d = 12, 6
    x = RNG.randn(m, d).astype(np.float64)
    y = (RNG.randn(m, d) + 0.5).astype(np.float64)
    sigmas = (1.0, 4.0)
    kxx = _np_rbf(x, x, sigmas); kxy = _np_rbf(x, y, sigmas); kyy = _np_rbf(y, y, sigmas)

    # brute-force re-derivation of the same estimator, term by term
    mt = float(m)
    ktxx = kxx - np.diag(np.diag(kxx))
    ktyy = kyy - np.diag(np.diag(kyy))
    ktxx_sums = ktxx.sum(1); ktyy_sums = ktyy.sum(1)
    kxy_sums_0 = kxy.sum(0); kxy_sums_1 = kxy.sum(1)
    want = (
        2 / (mt**2 * (mt-1)**2) * (2*ktxx_sums @ ktxx_sums - (ktxx**2).sum()
                                   + 2*ktyy_sums @ ktyy_sums - (ktyy**2).sum())
        - (4*mt-6) / (mt**3 * (mt-1)**3) * (ktxx.sum()**2 + ktyy.sum()**2)
        + 4*(mt-2) / (mt**3 * (mt-1)**2) * (kxy_sums_1 @ kxy_sums_1 + kxy_sums_0 @ kxy_sums_0)
        - 4*(mt-3) / (mt**3 * (mt-1)**2) * (kxy**2).sum()
        - (8*mt-12) / (mt**5 * (mt-1)) * kxy.sum()**2
        + 8 / (mt**3 * (mt-1)) * (
            (ktxx.sum() + ktyy.sum()) * kxy.sum() / mt
            - ktxx_sums @ kxy_sums_1 - ktyy_sums @ kxy_sums_0)
    )
    b = mix_rbf_kernel(jnp.array(x, jnp.float32), jnp.array(y, jnp.float32), sigmas=sigmas)
    got_mmd2, got_var = mmd2_and_variance(b)
    assert float(got_var) == pytest.approx(want, rel=1e-3, abs=1e-6)
    assert float(got_mmd2) == pytest.approx(_np_mmd2_unbiased(kxx, kxy, kyy), rel=1e-4)


def test_ratio_monotone_in_separation():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (64, 8))
    base = jax.random.normal(k2, (64, 8))
    ratios = []
    for shift in (0.5, 1.0, 2.0):
        b = kernel_matrices("gaussian", x, base + shift)
        ratios.append(float(mmd2_and_ratio(b)[1]))
    assert ratios[0] < ratios[1] < ratios[2]


def test_mmd2_gradients_finite_and_correct(feats):
    x, y = feats
    x, y = jnp.array(x[:8]), jnp.array(y[:8])

    def f(xx):
        return mmd2(kernel_matrices("rq", xx, y))

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite differences along a random direction
    v = jnp.array(RNG.randn(*x.shape).astype(np.float32))
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    analytic = jnp.vdot(g, v)
    assert float(analytic) == pytest.approx(float(fd), rel=5e-2, abs=1e-4)


def test_second_order_gradients_exist(feats):
    """Witness-GP / SMMD need grad-of-grad through the kernels."""
    x, y = feats
    x, y = jnp.array(x[:6]), jnp.array(y[:6])

    def inner(xx):
        return mmd2(kernel_matrices("gaussian", xx, y))

    def outer(xx):
        g = jax.grad(inner)(xx)
        return jnp.sum(g * g)

    gg = jax.grad(outer)(x)
    assert np.all(np.isfinite(np.asarray(gg)))


def test_rq_add_dot_variant():
    """kernel_add_dot (the lineage's mix_rq_dot): adds w*<x,y> to the RQ
    mixture; the diagonal becomes data-dependent so KernelBlocks must
    carry k_diag=None and the unbiased estimator must strip the REAL
    diagonal."""
    import jax
    import jax.numpy as jnp

    from smmdax.kernels import kernel_cross, kernel_matrices, mmd2

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (20, 6))
    y = jax.random.normal(k2, (24, 6)) + 0.3

    plain = kernel_matrices("rq", x, y)
    mixed = kernel_matrices("rq", x, y, add_dot=0.5)
    assert mixed.k_diag is None
    np.testing.assert_allclose(np.asarray(mixed.k_xy),
                               np.asarray(plain.k_xy + 0.5 * (x @ y.T)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(kernel_cross("rq", x, y, add_dot=0.5)),
        np.asarray(mixed.k_xy), rtol=1e-6, atol=1e-7)

    # unbiased estimator strips the data-dependent diagonal correctly
    got = float(mmd2(mixed))
    kxx = np.asarray(mixed.k_xx); kyy = np.asarray(mixed.k_yy)
    kxy = np.asarray(mixed.k_xy)
    m, n = len(x), len(y)
    want = ((kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
            - 2.0 * kxy.mean())
    assert got == pytest.approx(want, rel=1e-4)   # f32 vs f64-numpy oracle


def test_rq_add_dot_trains_end_to_end():
    """A training step with kernel_add_dot runs on BOTH execution
    paths — dense, and the fused Pallas path that round 3 extended to
    the mix_rq_dot term (the round-2 dense-only carve-out is gone) —
    and they agree."""
    import jax
    import jax.numpy as jnp

    import smmdax.pallas.mmd_kernel as pk
    from smmdax.configs import Config
    from smmdax.data import make_dataset
    from smmdax.train import create_state, jit_train_step

    def run(use_pallas):
        cfg = Config(model="mmd", kernel="rq", kernel_add_dot=0.1,
                     architecture="dcgan", dataset="synthetic",
                     output_size=32, batch_size=8, gf_dim=8, df_dim=8,
                     dof_dim=4, z_dim=8, dsteps=1, gsteps=1,
                     use_pallas=use_pallas, pallas_min_rows=1)
        src = make_dataset(cfg)
        flat = src.batch(2 * cfg.batch_size, key=0)
        batch = jnp.asarray(flat.reshape((2, cfg.batch_size)
                                         + flat.shape[1:]))
        state = create_state(cfg, jax.random.PRNGKey(0))
        state, metrics = jit_train_step(cfg, 1, 1)(state, batch)
        return float(metrics["d_loss_mmd2"])

    dense = run("off")
    assert np.isfinite(dense)
    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        fused = run("on")
    finally:
        pk._INTERPRET = old
    assert fused == pytest.approx(dense, rel=1e-4, abs=1e-7)
