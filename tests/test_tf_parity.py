"""TF parity harness (SURVEY.md §7 hard-part #2).

[SPEC] demands "bit-faithful loss values on fixed seeds" against the
TF1 reference.  The reference mount is empty and there is no network
(SURVEY.md provenance warning), so — exactly as SURVEY prescribes —
parity is defined against an INDEPENDENT TensorFlow re-expression of
the paper-exact formulas, written here with TF ops only (the installed
TF2 CPU package).  The day the reference mount works, these TF
functions are to be swapped for the reference's own core/mmd.py and the
tolerances tightened.

Covers: RBF/RQ mixture Gram blocks (incl. the rq+dot variant), unbiased
& biased MMD^2, the SMMD sigma for a linear critic, the WGAN-GP
penalty, the WITNESS gradient penalty, and the tmmd Sutherland
variance / t-ratio objective (round-4 additions — the two most
intricate formulas in the lineage, previously pinned only by numpy
reimplementations).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from smmdax.configs import Config
from smmdax.kernels import kernel_matrices, mmd2
from smmdax.losses import critic_loss, sobolev_scale, wgan_gradient_penalty

SIGMAS = (1.0, 2.0, 4.0, 8.0, 16.0)
ALPHAS = (0.2, 0.5, 1.0, 2.0, 5.0)


# --- independent TF implementation (paper formulas, TF ops only) ---------

def _tf_sq_dists(x, y):
    xx = tf.reduce_sum(tf.square(x), 1, keepdims=True)
    yy = tf.reduce_sum(tf.square(y), 1, keepdims=True)
    return tf.maximum(xx + tf.transpose(yy) - 2.0 * tf.matmul(x, y,
                                                              transpose_b=True), 0.0)


def _tf_mix_rbf(d2):
    return tf.add_n([tf.exp(-d2 / (2.0 * s * s)) for s in SIGMAS])


def _tf_mix_rq(d2):
    return tf.add_n([tf.pow(1.0 + d2 / (2.0 * a), -a) for a in ALPHAS])


def _tf_mmd2(x, y, kernel, biased=False):
    k = _tf_mix_rbf if kernel == "gaussian" else _tf_mix_rq
    kxx = k(_tf_sq_dists(x, x))
    kyy = k(_tf_sq_dists(y, y))
    kxy = k(_tf_sq_dists(x, y))
    m = tf.cast(tf.shape(x)[0], tf.float32)
    n = tf.cast(tf.shape(y)[0], tf.float32)
    if biased:
        return (tf.reduce_sum(kxx) / (m * m) + tf.reduce_sum(kyy) / (n * n)
                - 2.0 * tf.reduce_sum(kxy) / (m * n))
    diag = float(len(SIGMAS))
    return ((tf.reduce_sum(kxx) - m * diag) / (m * (m - 1.0))
            + (tf.reduce_sum(kyy) - n * diag) / (n * (n - 1.0))
            - 2.0 * tf.reduce_sum(kxy) / (m * n))


def _tf_gram(x, y, kernel, add_dot=0.0):
    """Full Gram block k(x_i, y_j) for the mixtures, incl. the
    lineage's mix_rq_dot variant (rq mixture + add_dot * <x, y>)."""
    k = _tf_mix_rbf if kernel == "gaussian" else _tf_mix_rq
    g = k(_tf_sq_dists(x, y))
    if add_dot:
        g = g + add_dot * tf.matmul(x, y, transpose_b=True)
    return g


def _tf_witness_gp(xhat, f_real, f_fake, w, kernel, variant,
                   add_dot=0.0):
    """Witness gradient penalty (Demystifying MMD GANs) for a linear
    critic phi(x) = x @ w, penalized at the given interpolates:
    wit(x') = mean_j k(phi(x'), f_fake_j) - mean_j k(phi(x'), f_real_j),
    penalty = mean(relu(|grad| - 1)^2) (one-sided) or mean((|grad|-1)^2).
    """
    xt = tf.constant(xhat)
    with tf.GradientTape() as tape:
        tape.watch(xt)
        fx = tf.matmul(xt, tf.constant(w))
        wit = (tf.reduce_mean(_tf_gram(fx, tf.constant(f_fake), kernel,
                                       add_dot), axis=1)
               - tf.reduce_mean(_tf_gram(fx, tf.constant(f_real), kernel,
                                         add_dot), axis=1))
        total = tf.reduce_sum(wit)
    g = tape.gradient(total, xt)
    n = tf.sqrt(tf.reduce_sum(tf.square(g), axis=1) + 1e-12)
    if variant == "one_sided":
        return float(tf.reduce_mean(tf.square(tf.maximum(n - 1.0, 0.0))))
    return float(tf.reduce_mean(tf.square(n - 1.0)))


def _tf_mmd2_and_variance(k_xx, k_xy, k_yy):
    """Sutherland et al. (ICLR 2017, arXiv:1611.04488 appendix A)
    variance of the unbiased MMD^2 U-statistic, re-expressed with TF
    ops from the published formula (m == n)."""
    m = tf.cast(tf.shape(k_xx)[0], tf.float32)
    diag_x = tf.linalg.diag_part(k_xx)
    diag_y = tf.linalg.diag_part(k_yy)
    kt_xx_sums = tf.reduce_sum(k_xx, axis=1) - diag_x
    kt_yy_sums = tf.reduce_sum(k_yy, axis=1) - diag_y
    k_xy_sums_0 = tf.reduce_sum(k_xy, axis=0)   # per-y column sums
    k_xy_sums_1 = tf.reduce_sum(k_xy, axis=1)   # per-x row sums
    kt_xx_sum = tf.reduce_sum(kt_xx_sums)
    kt_yy_sum = tf.reduce_sum(kt_yy_sums)
    k_xy_sum = tf.reduce_sum(k_xy_sums_0)
    kt_xx_2_sum = (tf.reduce_sum(tf.square(k_xx))
                   - tf.reduce_sum(tf.square(diag_x)))
    kt_yy_2_sum = (tf.reduce_sum(tf.square(k_yy))
                   - tf.reduce_sum(tf.square(diag_y)))
    k_xy_2_sum = tf.reduce_sum(tf.square(k_xy))

    mmd2_v = (kt_xx_sum / (m * (m - 1.0)) + kt_yy_sum / (m * (m - 1.0))
              - 2.0 * k_xy_sum / (m * m))
    var = (
        2.0 / (m**2 * (m - 1.0)**2)
        * (2.0 * tf.reduce_sum(tf.square(kt_xx_sums)) - kt_xx_2_sum
           + 2.0 * tf.reduce_sum(tf.square(kt_yy_sums)) - kt_yy_2_sum)
        - (4.0 * m - 6.0) / (m**3 * (m - 1.0)**3)
        * (kt_xx_sum**2 + kt_yy_sum**2)
        + 4.0 * (m - 2.0) / (m**3 * (m - 1.0)**2)
        * (tf.reduce_sum(tf.square(k_xy_sums_1))
           + tf.reduce_sum(tf.square(k_xy_sums_0)))
        - 4.0 * (m - 3.0) / (m**3 * (m - 1.0)**2) * k_xy_2_sum
        - (8.0 * m - 12.0) / (m**5 * (m - 1.0)) * k_xy_sum**2
        + 8.0 / (m**3 * (m - 1.0))
        * (1.0 / m * (kt_xx_sum + kt_yy_sum) * k_xy_sum
           - tf.tensordot(kt_xx_sums, k_xy_sums_1, 1)
           - tf.tensordot(kt_yy_sums, k_xy_sums_0, 1))
    )
    return float(mmd2_v), float(var)


# --- parity tests ---------------------------------------------------------

@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((48, 12)).astype(np.float32) * 0.7
    y = (rng.standard_normal((48, 12)) * 0.7 + 0.3).astype(np.float32)
    return x, y


@pytest.mark.parametrize("kernel", ["gaussian", "rq"])
@pytest.mark.parametrize("biased", [False, True])
def test_mmd2_matches_tf(feats, kernel, biased):
    x, y = feats
    ours = float(mmd2(kernel_matrices(
        kernel, jnp.asarray(x), jnp.asarray(y),
        rbf_sigmas=SIGMAS, rq_alphas=ALPHAS), biased=biased))
    theirs = float(_tf_mmd2(tf.constant(x), tf.constant(y), kernel,
                            biased=biased))
    # f32 summation order differs between frameworks; ~1e-4 relative is
    # the achievable cross-framework agreement for these reductions
    assert ours == pytest.approx(theirs, rel=2e-4, abs=5e-6)


def test_smmd_sigma_matches_tf(feats):
    """sigma for a linear critic phi(x) = x W: TF computes the full
    Jacobian-Frobenius norm per sample via tf.GradientTape.jacobian."""
    x, _ = feats
    rng = np.random.default_rng(1)
    w = rng.standard_normal((12, 5)).astype(np.float32) * 0.4
    lam = 3.0

    cfg = Config(model="smmd", scaling_coeff=lam)
    critic = lambda v: v.reshape(v.shape[0], -1) @ jnp.asarray(w)
    ours = float(sobolev_scale(cfg, critic, jnp.asarray(x)))

    xt = tf.constant(x)
    with tf.GradientTape() as tape:
        tape.watch(xt)
        phi = tf.matmul(xt, tf.constant(w))
    jac = tape.batch_jacobian(phi, xt)          # (B, 5, 12)
    grad_sq = tf.reduce_sum(tf.square(jac), axis=[1, 2])
    theirs = float(lam + tf.reduce_mean(grad_sq))
    assert ours == pytest.approx(theirs, rel=2e-4)


def test_wgan_gp_matches_tf(feats):
    """Same interpolates (eps fed explicitly to both sides) -> same
    penalty for the linear scalar critic."""
    x, y = feats
    rng = np.random.default_rng(2)
    a = rng.standard_normal((12, 1)).astype(np.float32)
    eps = rng.uniform(0, 1, (48, 1)).astype(np.float32)
    xhat = eps * x + (1 - eps) * y

    # ours: penalty formula on the same xhat (two-sided)
    from smmdax.losses import _grad_norms, _penalize, _scalar_critic
    critic = lambda v: v.reshape(v.shape[0], -1) @ jnp.asarray(a)
    norms = _grad_norms(lambda v: _scalar_critic(critic(v)),
                        jnp.asarray(xhat))
    ours = float(_penalize(norms, "two_sided"))

    xt = tf.constant(xhat)
    with tf.GradientTape() as tape:
        tape.watch(xt)
        h = tf.reduce_sum(tf.matmul(xt, tf.constant(a)), axis=1)
    g = tape.gradient(h, xt)
    n = tf.sqrt(tf.reduce_sum(tf.square(g), axis=1) + 1e-12)
    theirs = float(tf.reduce_mean(tf.square(n - 1.0)))
    assert ours == pytest.approx(theirs, rel=2e-4)


def test_full_critic_loss_matches_tf_composition(feats):
    """End-to-end smmd critic loss for a fixed linear critic equals the
    TF composition -(mmd2 / sigma)."""
    x, y = feats
    rng = np.random.default_rng(3)
    w = rng.standard_normal((12, 5)).astype(np.float32) * 0.3
    lam = 10.0

    cfg = Config(model="smmd", kernel="rq", scaling_coeff=lam,
                 rq_alphas=ALPHAS)
    critic = lambda v: v.reshape(v.shape[0], -1) @ jnp.asarray(w)
    # feats enter image-shaped: reshape x,y to (B, 3, 4, 1)? keep flat:
    real = jnp.asarray(x)
    fake = jnp.asarray(y)
    loss, aux = critic_loss(cfg, critic, real, fake, jax.random.PRNGKey(0))

    fx = tf.matmul(tf.constant(y), tf.constant(w))   # fake features
    fy = tf.matmul(tf.constant(x), tf.constant(w))   # real features
    tf_mmd2 = _tf_mmd2(fx, fy, "rq")
    xt = tf.constant(x)
    with tf.GradientTape() as tape:
        tape.watch(xt)
        phi = tf.matmul(xt, tf.constant(w))
    jac = tape.batch_jacobian(phi, xt)
    sigma = lam + tf.reduce_mean(tf.reduce_sum(tf.square(jac), axis=[1, 2]))
    theirs = float(-(tf_mmd2 / sigma))
    assert float(loss) == pytest.approx(theirs, rel=1e-4, abs=1e-6)


@pytest.mark.parametrize("kernel,add_dot", [("gaussian", 0.0),
                                            ("rq", 0.0), ("rq", 0.5)])
@pytest.mark.parametrize("variant", ["one_sided", "two_sided"])
def test_witness_gp_matches_tf(feats, kernel, add_dot, variant):
    """The witness gradient penalty through the PUBLIC entry point
    (witness_gradient_penalty draws its own interpolation eps from the
    jax rng; the TF side receives the identical xhat)."""
    x, y = feats
    rng = np.random.default_rng(4)
    w = rng.standard_normal((12, 5)).astype(np.float32) * 0.4
    cfg = Config(model="mmd", kernel=kernel, gradient_penalty=1.0,
                 gp_variant=variant, kernel_add_dot=add_dot,
                 rbf_sigmas=SIGMAS, rq_alphas=ALPHAS)
    critic = lambda v: v.reshape(v.shape[0], -1) @ jnp.asarray(w)
    real, fake = jnp.asarray(x), jnp.asarray(y)
    f_real = np.asarray(critic(real))
    f_fake = np.asarray(critic(fake))

    from smmdax.losses import witness_gradient_penalty
    key = jax.random.PRNGKey(7)
    ours = float(witness_gradient_penalty(cfg, critic, real, fake,
                                          jnp.asarray(f_real),
                                          jnp.asarray(f_fake), key))

    # identical interpolates: replicate the function's own eps draw
    eps = np.asarray(jax.random.uniform(key, (x.shape[0], 1)))
    xhat = eps * x + (1.0 - eps) * y
    # rq+dot only applies add_dot for the rq kernel (losses._add_dot)
    eff_dot = add_dot if kernel == "rq" else 0.0
    theirs = _tf_witness_gp(xhat, f_real, f_fake, w, kernel, variant,
                            add_dot=eff_dot)
    assert ours == pytest.approx(theirs, rel=3e-4, abs=1e-7)


@pytest.mark.parametrize("kernel,add_dot", [("gaussian", 0.0),
                                            ("rq", 0.0), ("rq", 0.5)])
def test_tmmd_variance_and_ratio_match_tf(feats, kernel, add_dot):
    """The Sutherland variance estimator and the t-ratio objective —
    the most cancellation-heavy formula in the lineage — against the
    independent TF re-expression of arXiv:1611.04488 appendix A."""
    from smmdax.kernels import mmd2_and_ratio
    from smmdax.kernels.mmd import mmd2_and_variance
    x, y = feats
    blocks = kernel_matrices(kernel, jnp.asarray(x), jnp.asarray(y),
                             rbf_sigmas=SIGMAS, rq_alphas=ALPHAS,
                             add_dot=add_dot)
    ours_mmd2, ours_var = mmd2_and_variance(blocks)
    _, ours_ratio = mmd2_and_ratio(blocks)

    xt, yt = tf.constant(x), tf.constant(y)
    eff_dot = add_dot if kernel == "rq" else 0.0
    tf_mmd2_v, tf_var = _tf_mmd2_and_variance(
        _tf_gram(xt, xt, kernel, eff_dot),
        _tf_gram(xt, yt, kernel, eff_dot),
        _tf_gram(yt, yt, kernel, eff_dot))
    assert float(ours_mmd2) == pytest.approx(tf_mmd2_v, rel=2e-4, abs=5e-6)
    # the variance is O(1e-4) after heavy cancellation; cross-framework
    # f32 agreement is looser than for plain sums
    assert float(ours_var) == pytest.approx(tf_var, rel=2e-3, abs=1e-9)
    tf_ratio = tf_mmd2_v / np.sqrt(max(tf_var, 1e-8))
    assert float(ours_ratio) == pytest.approx(tf_ratio, rel=2e-3)


def test_tmmd_critic_loss_matches_tf_composition(feats):
    """End-to-end tmmd critic loss (= -ratio) for a fixed linear critic
    equals the TF composition, incl. the mix_rq_dot kernel."""
    x, y = feats
    rng = np.random.default_rng(5)
    w = rng.standard_normal((12, 5)).astype(np.float32) * 0.3
    cfg = Config(model="tmmd", kernel="rq", kernel_add_dot=1.0,
                 rq_alphas=ALPHAS, with_sn=False, with_scaling=False)
    critic = lambda v: v.reshape(v.shape[0], -1) @ jnp.asarray(w)
    loss, aux = critic_loss(cfg, critic, jnp.asarray(x), jnp.asarray(y),
                            jax.random.PRNGKey(0))

    fx = tf.matmul(tf.constant(y), tf.constant(w))   # fake features
    fy = tf.matmul(tf.constant(x), tf.constant(w))   # real features
    tf_mmd2_v, tf_var = _tf_mmd2_and_variance(
        _tf_gram(fx, fx, "rq", 1.0), _tf_gram(fx, fy, "rq", 1.0),
        _tf_gram(fy, fy, "rq", 1.0))
    tf_ratio = tf_mmd2_v / np.sqrt(max(tf_var, 1e-8))
    assert float(loss) == pytest.approx(-tf_ratio, rel=2e-3)
    assert float(aux.mmd2) == pytest.approx(tf_mmd2_v, rel=2e-4, abs=5e-6)
