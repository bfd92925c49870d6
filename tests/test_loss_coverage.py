"""Remaining loss-dispatch coverage: tmmd ratio vs an independent numpy
implementation, wgan-gp with the scalar critic end-to-end, L2 penalty,
and the value_and_grad scaling variant in a real train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.data import make_dataset
from smmdax.data.pipeline import macro_batch_at
from smmdax.kernels import kernel_matrices, mmd2_and_variance
from smmdax.losses import critic_loss
from smmdax.train import create_state, jit_train_step


def _np_variance(kxx, kxy, kyy):
    """Sutherland et al. 2017 appendix A variance of MMD^2_u, written
    independently from the jnp implementation (full matrix forms)."""
    m = kxx.shape[0]
    kxx = kxx - np.diag(np.diag(kxx))
    kyy = kyy - np.diag(np.diag(kyy))
    kt_xx_sums = kxx.sum(1)
    kt_yy_sums = kyy.sum(1)
    k_xy_sums_0 = kxy.sum(0)
    k_xy_sums_1 = kxy.sum(1)
    kt_xx_sum = kt_xx_sums.sum()
    kt_yy_sum = kt_yy_sums.sum()
    k_xy_sum = k_xy_sums_0.sum()
    return (
        2 / (m**2 * (m - 1) ** 2)
        * (2 * (kt_xx_sums @ kt_xx_sums) - (kxx**2).sum()
           + 2 * (kt_yy_sums @ kt_yy_sums) - (kyy**2).sum())
        - (4 * m - 6) / (m**3 * (m - 1) ** 3) * (kt_xx_sum**2 + kt_yy_sum**2)
        + 4 * (m - 2) / (m**3 * (m - 1) ** 2)
        * ((k_xy_sums_1 @ k_xy_sums_1) + (k_xy_sums_0 @ k_xy_sums_0))
        - 4 * (m - 3) / (m**3 * (m - 1) ** 2) * (kxy**2).sum()
        - (8 * m - 12) / (m**5 * (m - 1)) * k_xy_sum**2
        + 8 / (m**3 * (m - 1))
        * (1 / m * (kt_xx_sum + kt_yy_sum) * k_xy_sum
           - kt_xx_sums @ k_xy_sums_1 - kt_yy_sums @ k_xy_sums_0)
    )


def test_tmmd_variance_matches_numpy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((24, 6)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((24, 6)) + 0.4, jnp.float32)
    blocks = kernel_matrices("rq", x, y)
    _, var = mmd2_and_variance(blocks)
    want = _np_variance(np.asarray(blocks.k_xx, np.float64),
                        np.asarray(blocks.k_xy, np.float64),
                        np.asarray(blocks.k_yy, np.float64))
    assert float(var) == pytest.approx(float(want), rel=1e-3)


def _run_two_steps(cfg):
    source = make_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    m = None
    for i in range(2):
        batch = jnp.asarray(macro_batch_at(source, i,
                                           cfg.dsteps + cfg.gsteps,
                                           cfg.real_batch_size))
        state, m = step(state, batch)
    return state, {k: float(v) for k, v in m.items()}


def test_wgan_scalar_critic_e2e():
    """The reference's wgan configuration: dof_dim=1 scalar critic."""
    cfg = Config(model="wgan-gp", dataset="synthetic", architecture="dcgan",
                 batch_size=8, output_size=32, gf_dim=8, df_dim=8, dof_dim=1,
                 z_dim=8, dsteps=2, gsteps=1, gradient_penalty=10.0,
                 gp_variant="two_sided")
    state, m = _run_two_steps(cfg)
    assert np.isfinite(m["d_gp"]) and m["d_gp"] >= 0
    assert np.isfinite(m["critic_real"]) and np.isfinite(m["critic_fake"])


def test_l2_penalty_increases_loss():
    cfg0 = Config(model="mmd", dataset="synthetic", architecture="dcgan",
                  batch_size=8, output_size=32, gf_dim=8, df_dim=8, dof_dim=4,
                  z_dim=8)
    cfg1 = cfg0.replace(L2_discriminator_penalty=10.0)
    k = jax.random.PRNGKey(0)
    real = jax.random.normal(k, (8, 4, 4, 1))
    fake = real + 1.0
    w = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    critic = lambda x: x.reshape(x.shape[0], -1) @ w
    l0, _ = critic_loss(cfg0, critic, real, fake, k)
    l1, _ = critic_loss(cfg1, critic, real, fake, k)
    assert float(l1) > float(l0)


def test_value_and_grad_scaling_e2e():
    cfg = Config(model="smmd", dataset="synthetic", architecture="dcgan",
                 batch_size=8, output_size=32, gf_dim=8, df_dim=8, dof_dim=4,
                 z_dim=8, dsteps=1, gsteps=1,
                 scaling_variant="value_and_grad", scaling_coeff=2.0)
    state, m = _run_two_steps(cfg)
    assert m["d_sigma"] > 2.0          # lambda + positive estimates
    assert np.isfinite(m["g_loss"])


def test_real_batch_differs_from_fake_batch():
    cfg = Config(model="mmd", dataset="synthetic", architecture="dcgan",
                 batch_size=8, real_batch_size=16, output_size=32,
                 gf_dim=8, df_dim=8, dof_dim=4, z_dim=8, dsteps=1, gsteps=1)
    state, m = _run_two_steps(cfg)
    assert np.isfinite(m["d_loss_mmd2"])


def test_gp_detach_sets_close_and_fast_path_works():
    """The detached-sets GP approximation stays close in value and the
    config flag produces finite grads."""
    from smmdax.losses import witness_gradient_penalty

    cfg_full = Config(model="mmd", gradient_penalty=1.0)
    cfg_det = cfg_full.replace(gp_detach_sets=True)
    k = jax.random.PRNGKey(0)
    real = jax.random.normal(k, (16, 4, 4, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 1)) + 0.5
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 4)) * 2.0

    def gp_of_w(cfg):
        def f(w):
            critic = lambda x: x.reshape(x.shape[0], -1) @ w
            fr, ff = critic(real), critic(fake)
            return witness_gradient_penalty(cfg, critic, real, fake, fr, ff,
                                            jax.random.PRNGKey(3))
        return f

    v_full = float(gp_of_w(cfg_full)(w))
    v_det = float(gp_of_w(cfg_det)(w))
    assert v_full == pytest.approx(v_det, rel=1e-5)   # same VALUE (only
    # the gradient differs: second-order paths through the sets are cut)
    g = jax.grad(gp_of_w(cfg_det))(w)
    assert np.isfinite(np.asarray(g)).all()
