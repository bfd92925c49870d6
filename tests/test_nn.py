"""Architecture and spectral-norm tests (SURVEY.md §4: built from
scratch — the reference ships no tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.nn import build_models
from smmdax.nn.layers import power_iteration


@pytest.mark.parametrize("arch", ["dcgan", "resnet"])
@pytest.mark.parametrize("size", [32, 64])
def test_shapes(arch, size):
    cfg = Config(architecture=arch, output_size=size, batch_size=2,
                 gf_dim=8, df_dim=8, dof_dim=4, z_dim=8)
    gen, disc = build_models(cfg)
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (2, cfg.z_dim))
    gv = gen.init({"params": k}, z, train=True)
    img, _ = gen.apply(gv, z, train=True, mutable=["batch_stats"])
    assert img.shape == (2, size, size, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0 + 1e-6  # tanh range
    dv = disc.init({"params": k}, img)
    feats = disc.apply(dv, img)
    assert feats.shape == (2, cfg.dof_dim)


def test_power_iteration_matches_svd():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((40, 12)), jnp.float32)
    u = jnp.asarray(rng.standard_normal(12), jnp.float32)
    u = u / jnp.linalg.norm(u)
    sigma, u = power_iteration(w, u, n_iters=50)
    true_sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    assert abs(float(sigma) - true_sigma) / true_sigma < 1e-4


def test_sn_normalizes_lipschitz():
    """After enough PI refreshes, every SN weight has spectral norm ~1."""
    cfg = Config(architecture="dcgan", model="sn-smmd", output_size=32,
                 df_dim=8, dof_dim=4)
    _, disc = build_models(cfg)
    k = jax.random.PRNGKey(1)
    img = jax.random.normal(k, (2, 32, 32, 3))
    dv = disc.init({"params": k}, img)
    params, spec = dv["params"], dv["spectral"]
    # scale weights up so normalization is non-trivial
    params = jax.tree.map(lambda p: p * 3.0, params)
    for _ in range(30):
        _, upd = disc.apply({"params": params, "spectral": spec}, img,
                            update_sn=True, mutable=["spectral"])
        spec = upd["spectral"]
    # check: normalized conv0 kernel has top singular value ~1
    kern = np.asarray(params["conv0"]["kernel"])
    u = np.asarray(spec["conv0"]["u"])
    w = kern.reshape(-1, kern.shape[-1])
    v = w @ u / np.linalg.norm(w @ u)
    sigma_est = float(v @ w @ u)
    true = np.linalg.svd(w, compute_uv=False)[0]
    wbar_sigma = np.linalg.svd(w / sigma_est, compute_uv=False)[0]
    assert abs(wbar_sigma - 1.0) < 1e-3, (wbar_sigma, sigma_est, true)


def test_sn_update_gating():
    """update_sn=False must leave the u state untouched even when the
    collection is mutable (once-per-step semantics)."""
    cfg = Config(architecture="dcgan", model="sn-smmd", output_size=32,
                 df_dim=8, dof_dim=4)
    _, disc = build_models(cfg)
    k = jax.random.PRNGKey(2)
    img = jax.random.normal(k, (2, 32, 32, 3))
    dv = disc.init({"params": k}, img)
    _, upd = disc.apply(dv, img, update_sn=False, mutable=["spectral"])
    for a, b in zip(jax.tree.leaves(dv["spectral"]),
                    jax.tree.leaves(upd["spectral"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
