"""Ring global-batch MMD == single-device estimator (SURVEY.md §7
hard-part #3: the classic silent-wrongness bug is diagonal/normalizer
mishandling when K is computed in blocks — this is the property test
that guards it)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from smmdax.kernels import kernel_matrices, mmd2
from smmdax.parallel import ring_mmd2

N_DEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("data",))


@pytest.mark.parametrize("kernel", ["gaussian", "rq", "distance", "dot"])
@pytest.mark.parametrize("biased", [False, True])
def test_ring_matches_global(kernel, biased):
    assert jax.device_count() >= N_DEV
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (64, 16)) * 0.6
    y = jax.random.normal(k2, (64, 16)) * 0.6 + 0.4

    mesh = _mesh()
    fn = shard_map(
        functools.partial(ring_mmd2, axis_name="data", kernel=kernel,
                          biased=biased),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    got = float(jax.jit(fn)(x, y))
    want = float(mmd2(kernel_matrices(kernel, x, y), biased=biased))
    assert got == pytest.approx(want, rel=2e-4, abs=1e-6)


def test_ring_unequal_batch_sizes():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (32, 8))
    y = jax.random.normal(k2, (64, 8)) + 0.3
    mesh = _mesh()
    fn = shard_map(
        functools.partial(ring_mmd2, axis_name="data", kernel="rq"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    got = float(jax.jit(fn)(x, y))
    want = float(mmd2(kernel_matrices("rq", x, y)))
    assert got == pytest.approx(want, rel=2e-4, abs=1e-6)


def test_ring_gradients_match_global():
    """Cross-shard gradients through ppermute must equal the global
    estimator's gradients."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (32, 8)) * 0.5
    y = jax.random.normal(k2, (32, 8)) * 0.5 + 0.3
    mesh = _mesh()

    ring = shard_map(
        functools.partial(ring_mmd2, axis_name="data", kernel="rq"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    gx_r, gy_r = jax.jit(jax.grad(lambda a, b: ring(a, b), argnums=(0, 1)))(x, y)
    gx_g, gy_g = jax.grad(
        lambda a, b: mmd2(kernel_matrices("rq", a, b)), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_g),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy_r), np.asarray(gy_g),
                               rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("kernel", ["gaussian", "rq", "distance", "dot"])
def test_ring_with_pallas_blocks_matches_global(kernel):
    """Ring + fused Pallas pair-sums (interpret mode) == dense global,
    in value and gradient."""
    import smmdax.pallas.mmd_kernel as pk
    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (32, 8)) * 0.5
        y = jax.random.normal(k2, (32, 8)) * 0.5 + 0.3
        mesh = _mesh()
        ring = shard_map(
            functools.partial(ring_mmd2, axis_name="data", kernel=kernel,
                              use_pallas=True),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_rep=False)
        got = float(jax.jit(ring)(x, y))
        want = float(mmd2(kernel_matrices(kernel, x, y)))
        assert got == pytest.approx(want, rel=2e-4, abs=1e-6)

        gx_r, gy_r = jax.jit(jax.grad(lambda a, b: ring(a, b),
                                      argnums=(0, 1)))(x, y)
        gx_g, gy_g = jax.grad(
            lambda a, b: mmd2(kernel_matrices(kernel, a, b)),
            argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_g),
                                   rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy_r), np.asarray(gy_g),
                                   rtol=5e-4, atol=1e-6)
    finally:
        pk._INTERPRET = old


@pytest.mark.parametrize("kernel", ["gaussian", "rq", "distance", "dot"])
def test_ring_ratio_matches_global(kernel):
    """Ring-form t-ratio (mmd2 AND Sutherland variance from psum'd
    sufficient stats) == dense single-device estimator, value + grad."""
    from smmdax.kernels import mmd2_and_ratio
    from smmdax.parallel.ring import ring_mmd2_and_ratio

    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(k1, (64, 16)) * 0.6
    y = jax.random.normal(k2, (64, 16)) * 0.6 + 0.4
    mesh = _mesh()

    ring = shard_map(
        functools.partial(ring_mmd2_and_ratio, axis_name="data",
                          kernel=kernel),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()))
    got_val, got_ratio = jax.jit(ring)(x, y)
    want_val, want_ratio = mmd2_and_ratio(kernel_matrices(kernel, x, y))
    assert float(got_val) == pytest.approx(float(want_val), rel=2e-4, abs=1e-6)
    assert float(got_ratio) == pytest.approx(float(want_ratio),
                                             rel=5e-4, abs=1e-6)

    # gradient of the RATIO (the tmmd training objective) must agree
    gx_r, gy_r = jax.jit(jax.grad(lambda a, b: ring(a, b)[1],
                                  argnums=(0, 1)))(x, y)
    gx_g, gy_g = jax.grad(
        lambda a, b: mmd2_and_ratio(kernel_matrices(kernel, a, b))[1],
        argnums=(0, 1))(x, y)
    # atol 2e-5 against gradients of scale ~0.2: f32 accumulation-order
    # noise between the blockwise and dense reductions (value agrees to
    # 5e-7; the variance formula's large cancellations amplify it)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_g),
                               rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy_r), np.asarray(gy_g),
                               rtol=1e-3, atol=2e-5)


@pytest.mark.parametrize("kernel", ["gaussian", "rq", "distance", "dot"])
def test_pair_stats_matches_dense(kernel):
    """Fused pair-stats (row sums / col sums / sum-of-squares) == dense
    oracle, value AND gradient, with and without diagonal exclusion."""
    import smmdax.pallas.mmd_kernel as pk
    from smmdax.pallas import make_pair_stats

    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        params = (1.0, 2.0, 4.0, 8.0, 16.0) if kernel == "gaussian" \
            else (0.2, 0.5, 1.0, 2.0, 5.0)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        a = jax.random.normal(k1, (48, 8)) * 0.7
        b = jax.random.normal(k2, (40, 8)) * 0.7 + 0.2

        for excl, bb in ((False, b), (True, a)):
            stats = make_pair_stats(kernel, params, exclude_diag=excl)
            rows, cols, sq = stats(a, bb)
            kmat = kernel_matrices(kernel, a, bb, rbf_sigmas=params,
                                   rq_alphas=params).k_xy
            if excl:
                kmat = kmat - jnp.diag(jnp.diag(kmat))
            np.testing.assert_allclose(np.asarray(rows),
                                       np.asarray(jnp.sum(kmat, 1)),
                                       rtol=2e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(cols),
                                       np.asarray(jnp.sum(kmat, 0)),
                                       rtol=2e-4, atol=1e-5)
            assert float(sq) == pytest.approx(float(jnp.sum(kmat * kmat)),
                                              rel=2e-4)

            # gradient of a generic functional of the stats
            ku1, ku2 = jax.random.split(jax.random.PRNGKey(7))
            u = jax.random.normal(ku1, (a.shape[0],))
            v = jax.random.normal(ku2, (bb.shape[0],))

            def loss_fused(aa, cc):
                r, c, s = stats(aa, cc)
                return jnp.dot(u, r) + jnp.dot(v, c) + 0.3 * s

            def loss_dense(aa, cc):
                km = kernel_matrices(kernel, aa, cc, rbf_sigmas=params,
                                     rq_alphas=params).k_xy
                if excl:
                    km = km - jnp.diag(jnp.diag(km))
                return (jnp.dot(u, jnp.sum(km, 1)) + jnp.dot(v, jnp.sum(km, 0))
                        + 0.3 * jnp.sum(km * km))

            gf = jax.grad(loss_fused, argnums=(0, 1))(a, bb)
            gd = jax.grad(loss_dense, argnums=(0, 1))(a, bb)
            for f, d in zip(gf, gd):
                np.testing.assert_allclose(np.asarray(f), np.asarray(d),
                                           rtol=5e-4, atol=1e-5)
    finally:
        pk._INTERPRET = old


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("biased", [False, True])
def test_ring_add_dot_matches_global(use_pallas, biased):
    """rq + add_dot (mix_rq_dot): the data-dependent diagonal
    k(x,x) = const + w*||x||^2 must survive the ring/Pallas paths —
    value AND gradient vs the dense oracle (VERDICT r2 item 5 lifts
    the dense-only carve-out)."""
    import smmdax.pallas.mmd_kernel as pk
    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        w = 0.5
        k1, k2 = jax.random.split(jax.random.PRNGKey(8))
        x = jax.random.normal(k1, (32, 8)) * 0.6
        y = jax.random.normal(k2, (32, 8)) * 0.6 + 0.4
        mesh = _mesh()
        ring = shard_map(
            functools.partial(ring_mmd2, axis_name="data", kernel="rq",
                              use_pallas=use_pallas, add_dot=w,
                              biased=biased),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_rep=False)
        got = float(jax.jit(ring)(x, y))
        want = float(mmd2(kernel_matrices("rq", x, y, add_dot=w),
                          biased=biased))
        assert got == pytest.approx(want, rel=2e-4, abs=1e-6)

        gx_r, gy_r = jax.jit(jax.grad(lambda a, b: ring(a, b),
                                      argnums=(0, 1)))(x, y)
        gx_g, gy_g = jax.grad(
            lambda a, b: mmd2(kernel_matrices("rq", a, b, add_dot=w),
                              biased=biased), argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_g),
                                   rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy_r), np.asarray(gy_g),
                                   rtol=5e-4, atol=1e-6)
    finally:
        pk._INTERPRET = old


@pytest.mark.parametrize("use_pallas", [False, True])
def test_ring_ratio_add_dot_matches_global(use_pallas):
    """tmmd t-ratio with rq + add_dot through the ring (and fused
    Pallas stats): value + ratio + gradient vs the dense estimator."""
    import smmdax.pallas.mmd_kernel as pk
    from smmdax.kernels import mmd2_and_ratio
    from smmdax.parallel.ring import ring_mmd2_and_ratio

    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        w = 0.3
        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        x = jax.random.normal(k1, (64, 16)) * 0.6
        y = jax.random.normal(k2, (64, 16)) * 0.6 + 0.4
        mesh = _mesh()
        ring = shard_map(
            functools.partial(ring_mmd2_and_ratio, axis_name="data",
                              kernel="rq", use_pallas=use_pallas, add_dot=w),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()),
            check_rep=False)
        got_val, got_ratio = jax.jit(ring)(x, y)
        want_val, want_ratio = mmd2_and_ratio(
            kernel_matrices("rq", x, y, add_dot=w))
        assert float(got_val) == pytest.approx(float(want_val),
                                               rel=2e-4, abs=1e-6)
        assert float(got_ratio) == pytest.approx(float(want_ratio),
                                                 rel=5e-4, abs=1e-6)

        gx_r, gy_r = jax.jit(jax.grad(lambda a, b: ring(a, b)[1],
                                      argnums=(0, 1)))(x, y)
        gx_g, gy_g = jax.grad(
            lambda a, b: mmd2_and_ratio(
                kernel_matrices("rq", a, b, add_dot=w))[1],
            argnums=(0, 1))(x, y)
        for got, want in ((gx_r, gx_g), (gy_r, gy_g)):
            scale = float(jnp.max(jnp.abs(want)))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=5e-3, atol=2e-3 * scale)
    finally:
        pk._INTERPRET = old


@pytest.mark.parametrize("kernel", ["gaussian", "rq", "distance", "dot"])
def test_ring_ratio_with_pallas_stats_matches_global(kernel):
    """Ring t-ratio through the fused pair-stats kernel == dense
    single-device estimator, value + grad (tmmd under DP, Gram-free)."""
    import smmdax.pallas.mmd_kernel as pk
    from smmdax.kernels import mmd2_and_ratio
    from smmdax.parallel.ring import ring_mmd2_and_ratio

    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        x = jax.random.normal(k1, (64, 16)) * 0.6
        y = jax.random.normal(k2, (64, 16)) * 0.6 + 0.4
        mesh = _mesh()

        ring = shard_map(
            functools.partial(ring_mmd2_and_ratio, axis_name="data",
                              kernel=kernel, use_pallas=True),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()),
            check_rep=False)
        got_val, got_ratio = jax.jit(ring)(x, y)
        want_val, want_ratio = mmd2_and_ratio(kernel_matrices(kernel, x, y))
        assert float(got_val) == pytest.approx(float(want_val),
                                               rel=2e-4, abs=1e-6)
        assert float(got_ratio) == pytest.approx(float(want_ratio),
                                                 rel=5e-4, abs=1e-6)

        def ratio_of(a, b2):
            return ring(a, b2)[1]

        gx_r, gy_r = jax.jit(jax.grad(ratio_of, argnums=(0, 1)))(x, y)
        gx_g, gy_g = jax.grad(
            lambda a, b2: mmd2_and_ratio(kernel_matrices(kernel, a, b2))[1],
            argnums=(0, 1))(x, y)
        # scale-aware: the f32 variance estimator's tiny-gradient entries
        # carry summation-order noise; what matters is error relative to
        # the gradient's magnitude (verified 3e-4 of scale vs f64)
        for got, want in ((gx_r, gx_g), (gy_r, gy_g)):
            scale = float(jnp.max(jnp.abs(want)))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=5e-3, atol=2e-3 * scale)
    finally:
        pk._INTERPRET = old
