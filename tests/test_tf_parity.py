"""TF parity harness (SURVEY.md §7 hard-part #2).

[SPEC] demands "bit-faithful loss values on fixed seeds" against the
TF1 reference.  The reference mount is empty and there is no network
(SURVEY.md provenance warning), so — exactly as SURVEY prescribes —
parity is defined against an INDEPENDENT TensorFlow re-expression of
the paper-exact formulas, written here with TF ops only (the installed
TF2 CPU package).  The day the reference mount works, these TF
functions are to be swapped for the reference's own core/mmd.py and the
tolerances tightened.

Covers: RBF/RQ mixture Gram blocks, unbiased & biased MMD^2, the SMMD
sigma for a linear critic, and the WGAN-GP penalty.
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
