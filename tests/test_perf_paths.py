"""Performance-path options: sigma estimators and bfloat16 compute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.losses import sobolev_scale
from smmdax.nn import build_models


def _linear_critic(w):
    return lambda x: x.reshape(x.shape[0], -1) @ w


def test_sum_estimator_closed_form():
    """sum estimator on a linear critic = ||sum of weight columns||^2."""
    cfg = Config(model="smmd", scaling_coeff=0.0,
                 scaling_grad_estimator="sum")
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 5)) * 0.4
    real = jax.random.normal(jax.random.PRNGKey(1), (6, 8))
    sigma = sobolev_scale(cfg, _linear_critic(w), real)
    expected = float(jnp.sum(jnp.sum(w, axis=1) ** 2))
    assert float(sigma) == pytest.approx(expected, rel=1e-5)


def test_hutchinson_unbiased():
    """E over probes of the hutchinson estimate == exact ||w||_F^2."""
    cfg_h = Config(model="smmd", scaling_coeff=0.0,
                   scaling_grad_estimator="hutchinson")
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 5)) * 0.4
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    critic = _linear_critic(w)
    vals = [float(sobolev_scale(cfg_h, critic, real, jax.random.PRNGKey(i)))
            for i in range(300)]
    exact = float(jnp.sum(w * w))
    assert np.mean(vals) == pytest.approx(exact, rel=0.05)


@pytest.mark.parametrize("arch", ["dcgan", "resnet"])
def test_bfloat16_compute_path(arch):
    """bf16 compute: params stay f32, outputs are f32 and finite, and
    results track the f32 path loosely."""
    cfg16 = Config(architecture=arch, model="sn-smmd", output_size=32,
                   batch_size=4, gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                   compute_dtype="bfloat16")
    cfg32 = cfg16.replace(compute_dtype="float32")
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (4, cfg16.z_dim))

    for cfg in (cfg16, cfg32):
        gen, disc = build_models(cfg)
        gv = gen.init({"params": k}, z, train=True)
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(gv["params"]))
        img, _ = gen.apply(gv, z, train=True, mutable=["batch_stats"])
        assert img.dtype == jnp.float32
        dv = disc.init({"params": k}, img)
        feats = disc.apply(dv, img)
        assert feats.dtype == jnp.float32
        assert np.isfinite(np.asarray(feats)).all()
        if cfg is cfg16:
            f16 = np.asarray(feats)
        else:
            f32 = np.asarray(feats)
    # same params (same init key): bf16 matmul noise only
    np.testing.assert_allclose(f16, f32, rtol=0.1, atol=0.05)


def test_bf16_train_step_runs():
    from smmdax.data import make_dataset
    from smmdax.data.pipeline import macro_batch_at
    from smmdax.train import create_state, jit_train_step

    cfg = Config(model="sn-smmd", dataset="synthetic", architecture="resnet",
                 batch_size=8, output_size=32, gf_dim=8, df_dim=8, dof_dim=4,
                 z_dim=8, dsteps=1, gsteps=1, compute_dtype="bfloat16",
                 scaling_grad_estimator="hutchinson")
    source = make_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, 1, 1)
    batch = jnp.asarray(macro_batch_at(source, 0, 2, cfg.batch_size))
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


def test_remat_matches_no_remat():
    """jax.checkpoint on the critic must not change loss or grads."""
    from smmdax.data import make_dataset
    from smmdax.data.pipeline import macro_batch_at
    from smmdax.train import create_state, jit_train_step

    base = dict(model="smmd", dataset="synthetic", architecture="dcgan",
                batch_size=8, output_size=32, gf_dim=8, df_dim=8, dof_dim=4,
                z_dim=8, dsteps=1, gsteps=1, gradient_penalty=1.0)
    cfg_a = Config(**base, remat=False)
    cfg_b = Config(**base, remat=True)
    source = make_dataset(cfg_a)
    batch = jnp.asarray(macro_batch_at(source, 0, 2, 8))

    outs = []
    for cfg in (cfg_a, cfg_b):
        state = create_state(cfg, jax.random.PRNGKey(0))
        step = jit_train_step(cfg, 1, 1)
        state, m = step(state, batch)
        outs.append({k: float(v) for k, v in m.items()})
    for k in outs[0]:
        assert outs[0][k] == pytest.approx(outs[1][k], rel=1e-5, abs=1e-7), k
