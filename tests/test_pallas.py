"""Pallas fused MMD kernel vs the pure-jnp oracle (value + gradient).

Runs in interpreter mode on CPU (the TPU compile path is exercised by
bench.py / the driver on real hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import smmdax.pallas.mmd_kernel as pk
from smmdax.kernels import kernel_matrices, mmd2

pytestmark = pytest.mark.usefixtures("pallas_interpret")


@pytest.fixture(scope="module")
def pallas_interpret():
    old = pk._INTERPRET
    pk._INTERPRET = True
    yield
    pk._INTERPRET = old


CASES = [("gaussian", (1.0, 2.0, 4.0, 8.0, 16.0)),
         ("rq", (0.2, 0.5, 1.0, 2.0, 5.0)),
         ("distance", ()),      # energy-distance kernel, no mixture params
         ("dot", ())]           # pure dot kernel (empty-mixture canon form)


@pytest.mark.parametrize("kernel,params", CASES)
@pytest.mark.parametrize("m,n,d", [(64, 64, 16), (100, 60, 16), (300, 300, 40)])
def test_fused_mmd2_matches_oracle(kernel, params, m, n, d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (m, d)) * 0.7
    y = jax.random.normal(k2, (n, d)) * 0.7 + 0.3
    got = float(pk.fused_mmd2(x, y, kernel, params))
    want = float(mmd2(kernel_matrices(kernel, x, y,
                                      rbf_sigmas=params, rq_alphas=params)))
    assert got == pytest.approx(want, rel=2e-4, abs=1e-5)


@pytest.mark.parametrize("kernel,params", CASES)
def test_fused_mmd2_biased_matches_oracle(kernel, params):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (48, 8))
    y = jax.random.normal(k2, (48, 8)) + 0.5
    got = float(pk.fused_mmd2(x, y, kernel, params, biased=True))
    want = float(mmd2(kernel_matrices(kernel, x, y, rbf_sigmas=params,
                                      rq_alphas=params), biased=True))
    assert got == pytest.approx(want, rel=2e-4, abs=1e-5)


@pytest.mark.parametrize("kernel,params", CASES)
def test_fused_gradients_match_oracle(kernel, params):
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (40, 12)) * 0.5
    y = jax.random.normal(k2, (56, 12)) * 0.5 + 0.2

    def loss_fused(x, y):
        return pk.fused_mmd2(x, y, kernel, params)

    def loss_oracle(x, y):
        return mmd2(kernel_matrices(kernel, x, y, rbf_sigmas=params,
                                    rq_alphas=params))

    gx_f, gy_f = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    gx_o, gy_o = jax.grad(loss_oracle, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_o),
                               rtol=2e-4, atol=1e-6)
