"""Loss-dispatch tests: signs, penalties, the SMMD normalizer, and
double differentiability (SURVEY.md §7 hard-part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.losses import (critic_loss, generator_loss, sobolev_scale,
                           wgan_gradient_penalty, witness_gradient_penalty)

K = jax.random.PRNGKey(0)


def _linear_critic(w):
    """Critic phi(x) = flatten(x) @ w — Jacobian is w, known in closed form."""
    return lambda x: x.reshape(x.shape[0], -1) @ w


def test_sobolev_scale_closed_form():
    """For a linear critic the Jacobian Frobenius norm is ||w||_F^2
    exactly, for every sample."""
    cfg = Config(model="smmd", scaling_coeff=3.0)
    w = jax.random.normal(K, (4 * 4 * 1, 5)) * 0.3
    real = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 4, 1))
    sigma = sobolev_scale(cfg, _linear_critic(w), real)
    expected = 3.0 + float(jnp.sum(w * w))
    assert abs(float(sigma) - expected) < 1e-4


def test_sobolev_scale_value_and_grad():
    cfg = Config(model="smmd", scaling_coeff=1.0,
                 scaling_variant="value_and_grad")
    w = jax.random.normal(K, (4 * 4 * 1, 5)) * 0.3
    real = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 4, 1))
    critic = _linear_critic(w)
    sigma = sobolev_scale(cfg, critic, real)
    feats = critic(real)
    expected = 1.0 + float(jnp.sum(w * w)) + float(jnp.mean(jnp.sum(feats**2, -1)))
    assert abs(float(sigma) - expected) < 1e-4


def test_wgan_gp_closed_form():
    """For critic h(x) = <a, x>, ||grad h|| = ||a|| everywhere, so the
    two-sided penalty is exactly (||a|| - 1)^2."""
    cfg = Config(model="wgan-gp", gp_variant="two_sided")
    a = jax.random.normal(K, (4 * 4 * 1, 1)) * 2.0
    critic = _linear_critic(a)
    real = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 1))
    fake = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 1))
    gp = wgan_gradient_penalty(cfg, critic, real, fake, jax.random.PRNGKey(3))
    expected = (float(jnp.linalg.norm(a)) - 1.0) ** 2
    assert abs(float(gp) - expected) < 1e-4


@pytest.mark.parametrize("model,gp", [("mmd", 0.0), ("tmmd", 0.0),
                                      ("mmd", 1.0), ("smmd", 0.0),
                                      ("wgan-gp", 10.0)])
def test_losses_finite_and_double_differentiable(model, gp):
    """grad of the critic loss (which itself contains jax.grad for
    GP/SMMD) must exist and be finite — the double-backprop path."""
    cfg = Config(model=model, gradient_penalty=gp, dof_dim=3)
    w = jax.random.normal(K, (4 * 4 * 2, 3)) * 0.5
    real = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 2))
    fake = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 2)) + 0.5

    def loss_of_w(w):
        loss, _ = critic_loss(cfg, _linear_critic(w), real, fake,
                              jax.random.PRNGKey(3))
        return loss

    g = jax.grad(loss_of_w)(w)
    assert np.isfinite(np.asarray(g)).all()
    loss, aux = critic_loss(cfg, _linear_critic(w), real, fake,
                            jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    gl, _ = generator_loss(cfg, _linear_critic(w), real, fake)
    assert np.isfinite(float(gl))


def test_critic_maximizes_mmd_sign():
    """d_loss must equal -(mmd2/sigma) when penalties are off."""
    cfg = Config(model="mmd", kernel="gaussian")
    # keep features within kernel bandwidth so the shift dominates noise
    w = jax.random.normal(K, (4 * 4 * 1, 4)) * 0.1
    real = jax.random.normal(jax.random.PRNGKey(1), (64, 4, 4, 1))
    fake = real + 2.0
    loss, aux = critic_loss(cfg, _linear_critic(w), real, fake,
                            jax.random.PRNGKey(2))
    assert float(loss) == pytest.approx(-float(aux.mmd2), rel=1e-6)
    assert float(aux.mmd2) > 0


def test_witness_penalty_nonnegative():
    cfg = Config(model="mmd", gradient_penalty=1.0, gp_variant="one_sided")
    w = jax.random.normal(K, (4 * 4 * 1, 4)) * 5.0
    real = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 1))
    fake = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 1)) + 1.0
    critic = _linear_critic(w)
    gp = witness_gradient_penalty(cfg, critic, real, fake,
                                  critic(real), critic(fake),
                                  jax.random.PRNGKey(3))
    assert float(gp) >= 0.0


def test_fuse_critic_batches_parity():
    """fuse_critic_batches applies the critic once on concat(real, fake);
    per-sample critics make this exactly equivalent — loss values and
    parameter gradients must match the unfused path (f32)."""
    import jax
    import jax.numpy as jnp
    from smmdax.configs import Config
    from smmdax.losses import critic_loss, generator_loss

    k1, k2, k3, kw = jax.random.split(jax.random.PRNGKey(0), 4)
    real = jax.random.normal(k1, (12, 8, 8, 3))
    fake = jax.random.normal(k2, (12, 8, 8, 3))
    w0 = jax.random.normal(kw, (8 * 8 * 3, 16)) * 0.1

    def make_critic(w):
        return lambda x: jnp.tanh(x.reshape(x.shape[0], -1) @ w)

    outs = {}
    for fuse in (True, False):
        cfg = Config(model="mmd", kernel="rq", gradient_penalty=1.0,
                     gp_variant="two_sided", fuse_critic_batches=fuse)

        def d_loss(w):
            return critic_loss(cfg, make_critic(w), real, fake, k3)[0]

        def g_loss(w):
            return generator_loss(cfg, make_critic(w), real, fake)[0]

        outs[fuse] = (d_loss(w0), jax.grad(d_loss)(w0), g_loss(w0))

    import numpy as np
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-6)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(outs[True][2], outs[False][2], rtol=1e-6)
