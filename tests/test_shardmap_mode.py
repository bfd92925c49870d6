"""shard_map ring training mode: runs, keeps state replicated, and the
loss equals the single-device global-batch loss."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from smmdax.configs import Config
from smmdax.data import make_dataset
from smmdax.data.pipeline import macro_batch_at
from smmdax.losses import critic_loss, mmd2_objective
from smmdax.train import create_state, jit_train_step, make_mesh

N_DEV = 8


def _tiny_cfg(**kw):
    base = dict(model="smmd", kernel="rq", dataset="synthetic", batch_size=16,
                output_size=32, gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                dsteps=1, gsteps=1, num_data_shards=N_DEV, use_ring_mmd=True)
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("use_ring", [True, False])
def test_sharded_critic_loss_matches_global(use_ring):
    """critic_loss under shard_map (gather or ring path) == global."""
    cfg = _tiny_cfg(use_ring_mmd=use_ring, model="smmd")
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    real = jax.random.normal(k1, (16, 4, 4, 2)) * 0.5
    fake = jax.random.normal(k2, (16, 4, 4, 2)) * 0.5 + 0.3
    w = jax.random.normal(k3, (4 * 4 * 2, 4)) * 0.3
    critic = lambda x: x.reshape(x.shape[0], -1) @ w

    loss_g, aux_g = critic_loss(cfg, critic, real, fake, jax.random.PRNGKey(1))

    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("data",))
    fn = shard_map(
        lambda r, f: critic_loss(cfg, critic, r, f, jax.random.PRNGKey(1),
                                 axis_name="data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()),
        check_rep=False)
    loss_s, aux_s = jax.jit(fn)(real, fake)
    assert float(loss_s) == pytest.approx(float(loss_g), rel=2e-4, abs=1e-6)
    assert float(aux_s.sigma) == pytest.approx(float(aux_g.sigma), rel=2e-4)
    assert float(aux_s.mmd2) == pytest.approx(float(aux_g.mmd2), rel=2e-4,
                                              abs=1e-6)


def test_shardmap_step_runs_and_stays_replicated():
    cfg = _tiny_cfg()
    source = make_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(N_DEV)
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, mesh=mesh,
                          mode="shard_map")
    for i in range(2):
        batch = jnp.asarray(macro_batch_at(source, i, 2, cfg.batch_size))
        state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # replication check: the same value must be on every device shard
    leaf = jax.tree.leaves(state.d_params)[0]
    vals = [np.asarray(s.data) for s in leaf.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(vals[0], v)
    assert int(state.step) == 2


def test_hutchinson_sigma_unbiased_under_dp():
    """sigma with the hutchinson estimator under shard_map: each shard
    draws its own Rademacher probe (rng is shard-folded), so the
    pmean'd sigma is an N-probe unbiased estimate of the global
    ||J||_F^2 — NOT bit-equal to the single-device single-probe draw.
    This pins those semantics: averaging the sharded estimate over
    probe draws must converge to the exact-jacrev sigma."""
    from smmdax.losses import sobolev_scale
    from smmdax.train import _shard_rng

    cfg = _tiny_cfg(model="smmd", scaling_grad_estimator="hutchinson")
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    real = jax.random.normal(k1, (16, 4, 4, 2)) * 0.5
    w = jax.random.normal(k2, (4 * 4 * 2, 4)) * 0.3
    critic = lambda x: jnp.tanh(x.reshape(x.shape[0], -1) @ w)

    sigma_exact = float(sobolev_scale(
        cfg.replace(scaling_grad_estimator="exact"), critic, real))

    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("data",))
    fn = jax.jit(shard_map(
        lambda r, rng: jax.lax.pmean(
            sobolev_scale(cfg, critic, r, rng=_shard_rng(rng, "data")),
            "data"),
        mesh=mesh, in_specs=(P("data"), P()), out_specs=P(),
        check_rep=False))

    draws = np.array([float(fn(real, jax.random.PRNGKey(1000 + i)))
                      for i in range(48)])
    # per-draw spread exists (it's an estimator)...
    assert draws.std() > 0
    # ...but the mean converges to the exact Frobenius sigma
    assert draws.mean() == pytest.approx(sigma_exact, rel=0.05)


@pytest.mark.parametrize("model,gp,ring", [
    ("mmd", 1.0, False),       # witness GP through gathered features
    ("mmd", 1.0, True),        # witness GP alongside the ring estimator
    ("wgan-gp", 1.0, False),   # WGAN-GP double backprop under shard_map
])
def test_shardmap_gp_step_runs_and_stays_replicated(model, gp, ring):
    """GP-bearing losses under shard_map: double backprop through the
    per-shard critic + collectives must run, stay finite, and keep the
    replicated state bit-identical across shards (VERDICT r2 item 2b).

    Per-shard-eps semantics (documented here as the normative
    statement): inside shard_map each shard draws its OWN interpolation
    eps from the shard-folded RNG (train._shard_rng), so the penalty is
    the pmean of per-shard witness-GP estimates over local
    interpolates.  That is an unbiased estimate of the same
    global-batch penalty but NOT bit-equal to the single-device draw —
    value parity is a GSPMD-mode guarantee (test_train.py), while
    shard_map mode guarantees replicated, finite training."""
    # two_sided: a fresh critic's witness grad norms are << 1, so the
    # one-sided penalty would be exactly 0 and assert nothing
    cfg = _tiny_cfg(model=model, gradient_penalty=gp, use_ring_mmd=ring,
                    with_scaling=False, with_sn=False,
                    gp_variant="two_sided")
    source = make_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(N_DEV)
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, mesh=mesh,
                          mode="shard_map")
    for i in range(2):
        batch = jnp.asarray(macro_batch_at(source, i, 2, cfg.batch_size))
        state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["d_gp"]) > 0.0
    for leaf in (jax.tree.leaves(state.d_params)[0],
                 jax.tree.leaves(state.g_params)[0]):
        vals = [np.asarray(s.data) for s in leaf.addressable_shards]
        for v in vals[1:]:
            np.testing.assert_array_equal(vals[0], v)


def test_sharded_tmmd_ring_loss_matches_global():
    """tmmd (t-ratio) under shard_map + ring variance stats == the
    single-device dense estimator (round 2: no gathered Gram blocks)."""
    cfg = _tiny_cfg(model="tmmd", use_ring_mmd=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    real = jax.random.normal(k1, (16, 4, 4, 2)) * 0.5
    fake = jax.random.normal(k2, (16, 4, 4, 2)) * 0.5 + 0.3
    w = jax.random.normal(k3, (4 * 4 * 2, 4)) * 0.3
    critic = lambda x: x.reshape(x.shape[0], -1) @ w

    loss_g, aux_g = critic_loss(cfg, critic, real, fake, jax.random.PRNGKey(1))

    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("data",))
    fn = shard_map(
        lambda r, f: critic_loss(cfg, critic, r, f, jax.random.PRNGKey(1),
                                 axis_name="data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()),
        check_rep=False)
    loss_s, aux_s = jax.jit(fn)(real, fake)
    assert float(loss_s) == pytest.approx(float(loss_g), rel=5e-4, abs=1e-5)
    assert float(aux_s.ratio) == pytest.approx(float(aux_g.ratio),
                                               rel=5e-4, abs=1e-5)
    assert float(aux_s.mmd2) == pytest.approx(float(aux_g.mmd2), rel=2e-4,
                                              abs=1e-6)

    # and the gradient w.r.t. critic params (the training signal)
    def loss_of_w(wp, sharded):
        crit = lambda x: x.reshape(x.shape[0], -1) @ wp
        if sharded:
            f = shard_map(
                lambda r, fk: critic_loss(cfg, crit, r, fk,
                                          jax.random.PRNGKey(1),
                                          axis_name="data")[0],
                mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
                check_rep=False)
            return f(real, fake)
        return critic_loss(cfg, crit, real, fake, jax.random.PRNGKey(1))[0]

    g_s = jax.jit(jax.grad(lambda wp: loss_of_w(wp, True)))(w)
    g_g = jax.grad(lambda wp: loss_of_w(wp, False))(w)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                               rtol=1e-3, atol=2e-5)
