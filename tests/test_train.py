"""Train-step tests: state evolution, determinism, and the critical
data-parallel property — the sharded global-batch estimator matches the
single-device one (SURVEY.md §7 hard-part #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.data import make_dataset
from smmdax.data.pipeline import macro_batches
from smmdax.train import (create_state, jit_train_step, make_mesh, sample)


def _tiny_cfg(**kw):
    base = dict(model="mmd", kernel="rq", dataset="synthetic", batch_size=8,
                output_size=32, gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                dsteps=1, gsteps=1)
    base.update(kw)
    return Config(**base)


def _run_steps(cfg, n_steps=2, mesh=None, seed=0):
    ds = make_dataset(cfg)
    it = macro_batches(ds, cfg.dsteps + cfg.gsteps, cfg.batch_size)
    state = create_state(cfg, jax.random.PRNGKey(seed))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, mesh=mesh)
    metrics = None
    for _ in range(n_steps):
        state, metrics = step(state, jnp.asarray(next(it)))
    return state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize("model", ["mmd", "smmd", "sn-smmd", "wgan-gp"])
def test_step_runs_and_updates(model):
    cfg = _tiny_cfg(model=model,
                    gradient_penalty=1.0 if model == "wgan-gp" else 0.0)
    state0 = create_state(cfg, jax.random.PRNGKey(0))
    state, m = _run_steps(cfg, n_steps=2)
    assert int(state.step) == 2
    for k, v in m.items():
        assert np.isfinite(v), (k, v)
    # params actually moved
    d0 = jax.tree.leaves(state0.d_params)[0]
    d1 = jax.tree.leaves(state.d_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_determinism():
    cfg = _tiny_cfg()
    _, m1 = _run_steps(cfg, n_steps=2, seed=7)
    _, m2 = _run_steps(cfg, n_steps=2, seed=7)
    assert m1 == m2


@pytest.mark.parametrize("model,gp", [
    ("mmd", 0.0),
    # the GP-bearing losses differentiate through all_gather'ed
    # features inside a grad-of-grad — exactly the construction that
    # can break silently under GSPMD partitioning (VERDICT r2 item 2)
    ("mmd", 1.0),
    ("wgan-gp", 1.0),
    ("smmd", 1.0),
])
def test_data_parallel_matches_single_device(model, gp):
    """The same global batch through a 8-shard mesh must produce the
    same losses and parameter updates as one device (to float32
    reduction tolerance)."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = _tiny_cfg(batch_size=16, num_data_shards=8, model=model,
                    gradient_penalty=gp)
    ds = make_dataset(cfg)
    it = macro_batches(ds, cfg.dsteps + cfg.gsteps, cfg.batch_size)
    batches = [jnp.asarray(next(it)) for _ in range(2)]

    state_a = create_state(cfg, jax.random.PRNGKey(0))
    state_b = create_state(cfg, jax.random.PRNGKey(0))
    step_1 = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, mesh=None)
    step_8 = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, mesh=make_mesh(8))

    for b in batches:
        state_a, m_a = step_1(state_a, b)
        state_b, m_b = step_8(state_b, b)

    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=2e-3, atol=2e-5, err_msg=k)
    for pa, pb in zip(jax.tree.leaves(state_a.d_params),
                      jax.tree.leaves(state_b.d_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=1e-4)


def test_steps_per_dispatch_bit_identical():
    """K macro-steps fused into one scanned dispatch must produce the
    SAME state as K separate dispatches — the scan chains the identical
    per-step program, and batches are a pure function of (seed, step)
    (VERDICT r3 item 1: math unchanged)."""
    cfg = _tiny_cfg(model="sn-smmd")
    ds = make_dataset(cfg)
    it = macro_batches(ds, cfg.dsteps + cfg.gsteps, cfg.batch_size)
    batches = [np.asarray(next(it)) for _ in range(4)]

    state_1 = create_state(cfg, jax.random.PRNGKey(0))
    step_1 = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    for b in batches:
        state_1, m_1 = step_1(state_1, jnp.asarray(b))

    state_k = create_state(cfg, jax.random.PRNGKey(0))
    step_k = jit_train_step(cfg, cfg.dsteps, cfg.gsteps,
                            steps_per_dispatch=2)
    for i in (0, 2):
        state_k, m_k = step_k(state_k, jnp.asarray(np.stack(batches[i:i + 2])))

    assert int(state_k.step) == 4
    for a, b in zip(jax.tree.leaves(state_1), jax.tree.leaves(state_k)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the dispatch reports the LAST macro-step's metrics
    for k in m_1:
        np.testing.assert_array_equal(np.asarray(m_1[k]), np.asarray(m_k[k]))


def test_steps_per_dispatch_multi_device():
    """The scanned dispatch composes with GSPMD data parallelism (the
    scan axis is unsharded, the batch axis sharded)."""
    assert jax.device_count() >= 8
    cfg = _tiny_cfg(batch_size=16, num_data_shards=8)
    ds = make_dataset(cfg)
    it = macro_batches(ds, cfg.dsteps + cfg.gsteps, cfg.batch_size)
    stacked = jnp.asarray(np.stack([np.asarray(next(it)) for _ in range(2)]))
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, mesh=make_mesh(8),
                          steps_per_dispatch=2)
    state, metrics = step(state, stacked)
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


def test_on_device_data_dispatch_invariant():
    """on-device synthesis draws each macro-step's batch inside the
    scan body from that step's RNG — so K=2 dispatching is bit-equal
    to K=1 (the review found the one-draw-per-dispatch version made
    the data stream depend on dispatch grouping)."""
    from smmdax.train import jit_train_step_on_device
    cfg = _tiny_cfg(on_device_data=True)
    s1 = create_state(cfg, jax.random.PRNGKey(3))
    step1 = jit_train_step_on_device(cfg, cfg.dsteps, cfg.gsteps)
    for _ in range(4):
        s1, m1 = step1(s1)
    s2 = create_state(cfg, jax.random.PRNGKey(3))
    step2 = jit_train_step_on_device(cfg, cfg.dsteps, cfg.gsteps,
                                     steps_per_dispatch=2)
    for _ in range(2):
        s2, m2 = step2(s2)
    assert int(s2.step) == 4
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))


def test_on_device_data_rejects_scoring():
    with pytest.raises(ValueError, match="compute_scores"):
        _tiny_cfg(on_device_data=True, compute_scores=True)


def test_sample_shapes():
    cfg = _tiny_cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    imgs = sample(cfg, state, jax.random.PRNGKey(1), 10)
    assert imgs.shape == (10, 32, 32, 3)
    assert float(jnp.max(jnp.abs(imgs))) <= 1.0 + 1e-6


def test_sample_matches_chunked_loop():
    """The fused single-program sampler (z-gen + apply scanned over
    chunks in ONE dispatch) must reproduce the chunked Python loop it
    replaced: same per-chunk key sequence, same chunk order, same
    trailing slice — for n spanning several chunks and n not a chunk
    multiple."""
    from smmdax.train import _cached_gen_batch
    cfg = _tiny_cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    gen_batch = _cached_gen_batch(cfg)
    bs = cfg.batch_size
    for n in (bs * 3, bs * 2 + 3):
        rng = jax.random.PRNGKey(7)
        outs = []
        for _ in range(0, n, bs):
            rng, zk = jax.random.split(rng)
            z = jax.random.uniform(zk, (bs, cfg.z_dim),
                                   minval=-1.0, maxval=1.0)
            outs.append(gen_batch(state.g_params, state.g_batch_stats, z))
        loop_form = jnp.concatenate(outs)[:n]
        fused = sample(cfg, state, jax.random.PRNGKey(7), n)
        assert fused.shape == loop_form.shape
        np.testing.assert_allclose(np.asarray(fused),
                                   np.asarray(loop_form),
                                   rtol=1e-6, atol=1e-6)


def test_dynamic_lr_no_recompile():
    """Decaying state.lr_* must not trigger a recompile (KID scheduler)."""
    cfg = _tiny_cfg()
    ds = make_dataset(cfg)
    it = macro_batches(ds, cfg.dsteps + cfg.gsteps, cfg.batch_size)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    state, _ = step(state, jnp.asarray(next(it)))
    state = state.replace(lr_d=state.lr_d * 0.5, lr_g=state.lr_g * 0.5)
    compiled_before = step._cache_size()   # unconditional: if jit ever
    # drops this introspection API the test must fail loudly, not
    # silently assert nothing (round-1 review finding)
    state, m = step(state, jnp.asarray(next(it)))
    assert float(m["lr_d"]) == pytest.approx(cfg.lr_d * 0.5)
    assert step._cache_size() == compiled_before
