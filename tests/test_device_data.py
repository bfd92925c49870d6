"""Device-resident datasets (``data_placement=device``) + the RSS
watchdog.

Context (BASELINE.md round-3 row): the tunneled device client retains a
staging buffer per host->device transfer (~payload bytes), which
OOM-killed two >100k-step host-fed runs.  The device-resident path
uploads the dataset ONCE and gathers batches in-program from the RNG
chain — zero per-step transfer — and the watchdog turns residual RSS
creep into a graceful checkpoint-exit(+optional re-exec) instead of an
OOM kill.  These tests pin the correctness half: determinism, exact
resume, dispatch-invariance, and the watchdog's preemption semantics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.data.pipeline import ArraySource, materialize_u8
from smmdax.data.synthetic import GaussianMix, SyntheticImages
from smmdax.trainer import Trainer


def _cfg(tmp, **kw):
    base = dict(dataset="synthetic", architecture="dcgan", model="mmd",
                kernel="gaussian", batch_size=16, real_batch_size=16,
                output_size=32, gf_dim=4, df_dim=4, max_iteration=4,
                dsteps=1, gsteps=1, start_dsteps=2, warmup_iterations=2,
                z_dim=4, dof_dim=4, log_every=2, sample_every=0,
                checkpoint_every=0, MMD_lr_scheduler=False,
                data_placement="device", device_data_pool=96,
                checkpoint_dir=os.path.join(tmp, "ck"),
                sample_dir=os.path.join(tmp, "s"),
                log_dir=os.path.join(tmp, "l"))
    base.update(kw)
    return Config(**base)


# ---------------------------------------------------------------------------
# materialize_u8


def test_materialize_u8_passthrough_and_quantize():
    u8 = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    assert materialize_u8(ArraySource(u8)) is u8

    f32 = u8.astype(np.float32) / 127.5 - 1.0
    q = materialize_u8(ArraySource(f32))
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q, u8)


def test_materialize_u8_synthetic_pool_deterministic():
    src = SyntheticImages(8, 3, seed=7)
    a = materialize_u8(src, pool=32)
    b = materialize_u8(SyntheticImages(8, 3, seed=7), pool=32)
    assert a.shape == (32, 8, 8, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)        # pure function of seed
    assert materialize_u8(src, pool=0) is None  # pool required here


def test_materialize_u8_rejects_vector_sources():
    assert materialize_u8(GaussianMix(seed=0), pool=16) is None


def test_config_rejects_device_plus_on_device_data():
    with pytest.raises(ValueError, match="pick one"):
        Config(dataset="synthetic", data_placement="device",
               on_device_data=True, compute_scores=False)


# ---------------------------------------------------------------------------
# training semantics


def test_device_data_trains_and_scores(tmp_path):
    """Unlike on_device_data, device placement trains on the REAL
    dataset — so in-loop scoring works with it."""
    cfg = _cfg(str(tmp_path), compute_scores=True, score_every=2,
               no_of_samples=32, score_subset_size=32, score_subsets=2)
    t = Trainer(cfg)
    state = t.train()
    assert int(state.step) == 4
    import json
    rows = [json.loads(l) for l in open(
        os.path.join(cfg.log_dir, os.listdir(cfg.log_dir)[0]))]
    assert any("fid" in r for r in rows)
    assert all(np.isfinite(r.get("d_loss_mmd2", 0.0)) for r in rows)


def test_device_data_exact_resume(tmp_path):
    """Batches are a pure function of the checkpointed RNG chain:
    interrupted == uninterrupted, bit for bit."""
    full = Trainer(_cfg(str(tmp_path) + "/full", max_iteration=4,
                        checkpoint_every=100)).train()
    cfg_half = _cfg(str(tmp_path) + "/half", max_iteration=2,
                    checkpoint_every=2)
    Trainer(cfg_half).train()
    resumed = Trainer(cfg_half.replace(max_iteration=4)).train()
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_data_dispatch_invariance(tmp_path):
    """Single-chip K>1: the gather rng is folded INSIDE the scan body
    per macro-step, so the data stream (and the final state) is
    bit-identical to K=1."""
    s1 = Trainer(_cfg(str(tmp_path) + "/k1", max_iteration=5)).train()
    sk = Trainer(_cfg(str(tmp_path) + "/k3", max_iteration=5,
                      steps_per_dispatch=3)).train()
    assert int(sk.step) == 5
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(sk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_data_batches_come_from_the_pool(tmp_path):
    """With a single-row dataset every gathered batch IS that row: two
    different single-row datasets must produce different training
    trajectories, and two runs on the same row identical ones (the
    gather reads the resident data, not noise)."""
    from smmdax.train import create_state, jit_train_step_device_data

    cfg = _cfg(str(tmp_path))
    rng = np.random.default_rng(0)
    row_a = rng.integers(0, 256, (1, 32, 32, 3), np.uint8)
    row_b = rng.integers(0, 256, (1, 32, 32, 3), np.uint8)

    def run(row):
        state = create_state(cfg, jax.random.PRNGKey(1))
        fn = jit_train_step_device_data(cfg, 1, 1)
        state, metrics = fn(state, jax.device_put(row))
        return metrics

    m_a, m_a2, m_b = run(row_a), run(row_a), run(row_b)
    assert float(m_a["critic_real"]) == float(m_a2["critic_real"])
    assert float(m_a["critic_real"]) != float(m_b["critic_real"])


def test_device_data_batches_have_no_within_batch_duplicates():
    """VERDICT r3 weak #5: a with-replacement draw can duplicate a
    sample INSIDE one batch, perturbing the unbiased U-statistic's
    independence assumption.  The gather draws each update's batch
    without replacement (per row; across-update recurrence stays
    allowed), deterministically from the RNG chain."""
    from smmdax.train import _batch_indices
    # production branch (per_step*nb <= pool): ONE permutation sliced
    # into disjoint rows — duplicate-free across the whole macro-step
    idx = _batch_indices(jax.random.PRNGKey(3), pool_n=1000,
                         per_step=6, nb=64)
    assert idx.shape == (6, 64)
    flat = np.asarray(idx).ravel()
    assert len(np.unique(flat)) == len(flat), "duplicate across macro-step"
    assert flat.min() >= 0 and flat.max() < 1000
    # fallback branch (macro-step larger than the pool): per-row draws,
    # each row still duplicate-free
    idx_f = _batch_indices(jax.random.PRNGKey(3), pool_n=100,
                           per_step=6, nb=64)
    assert idx_f.shape == (6, 64)
    for row in np.asarray(idx_f):
        assert len(np.unique(row)) == len(row), "duplicate inside a batch"
    # deterministic per key
    idx2 = _batch_indices(jax.random.PRNGKey(3), pool_n=1000,
                          per_step=6, nb=64)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    # tiny pools (< batch) keep the with-replacement fallback
    small = _batch_indices(jax.random.PRNGKey(3), pool_n=4,
                           per_step=2, nb=16)
    assert small.shape == (2, 16)
    assert np.asarray(small).max() < 4


def test_device_data_gspmd_matches_single_device(tmp_path):
    """The device-resident gather under an 8-shard GSPMD mesh must
    match the single-device program: at K=1 both draw the SAME index
    stream (one fold of state.rng, same shape), so the whole step is
    bit-comparable to f32 reduction tolerance — the same property
    test_train.py pins for the host-fed path."""
    from smmdax.train import create_state, jit_train_step_device_data, make_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = _cfg(str(tmp_path), batch_size=16, real_batch_size=16,
               device_data_pool=64).replace(num_data_shards=8)
    pool = jnp.asarray(np.random.default_rng(3).integers(
        0, 256, (64, 32, 32, 3), np.uint8))

    state_a = create_state(cfg, jax.random.PRNGKey(0))
    state_b = create_state(cfg, jax.random.PRNGKey(0))
    step_1 = jit_train_step_device_data(cfg, 1, 1)
    step_8 = jit_train_step_device_data(cfg, 1, 1, mesh=make_mesh(8))

    for _ in range(2):
        state_a, m_a = step_1(state_a, pool)
        state_b, m_b = step_8(state_b, pool)

    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=2e-3, atol=2e-5, err_msg=k)
    for pa, pb in zip(jax.tree.leaves(state_a.d_params),
                      jax.tree.leaves(state_b.d_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=1e-4)


def test_device_data_sharded_pool(tmp_path):
    """device_data_sharding=sharded partitions the pool over the data
    axis (each chip holds pool/n rows — the HBM-scaling layout) and
    each shard gathers its B/n batch rows from its own slice.  Pins:
    per-device shard size, determinism, sensitivity to the pool
    contents, and a distinct stream from the replicated layout."""
    from jax.sharding import NamedSharding, PartitionSpec
    from smmdax.train import create_state, jit_train_step_device_data, make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    cfg = _cfg(str(tmp_path), batch_size=16, real_batch_size=16).replace(
        num_data_shards=8, device_data_sharding="sharded")
    rng = np.random.default_rng(5)
    pool_a = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)
    pool_b = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)

    def run(pool_np, sharding="sharded"):
        c = cfg.replace(device_data_sharding=sharding)
        spec = PartitionSpec("data") if sharding == "sharded" \
            else PartitionSpec()
        pool = jax.device_put(jnp.asarray(pool_np),
                              NamedSharding(mesh, spec))
        if sharding == "sharded":
            assert pool.addressable_shards[0].data.shape[0] == 8
        state = create_state(c, jax.random.PRNGKey(0))
        fn = jit_train_step_device_data(c, 1, 1, mesh=mesh)
        state, metrics = fn(state, pool)
        assert int(state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
        return float(metrics["critic_real"])

    assert run(pool_a) == run(pool_a)              # deterministic
    assert run(pool_a) != run(pool_b)              # reads the pool
    # per-shard index streams => a different (valid) batch draw than
    # the replicated layout's global stream
    assert run(pool_a) != run(pool_a, sharding="replicated")


def test_device_data_sharded_batch_divisibility(tmp_path):
    from smmdax.train import jit_train_step_device_data, make_mesh

    cfg = _cfg(str(tmp_path), batch_size=12, real_batch_size=12).replace(
        num_data_shards=8, device_data_sharding="sharded")
    with pytest.raises(ValueError, match="divisible"):
        jit_train_step_device_data(cfg, 1, 1, mesh=make_mesh(8))


def test_device_data_sharded_trainer_end_to_end(tmp_path):
    """Trainer wiring: pool truncated to a multiple of the mesh,
    placed P('data'), training runs to completion."""
    cfg = _cfg(str(tmp_path), batch_size=16, real_batch_size=16,
               device_data_pool=67,          # truncates to 64 on 8 shards
               max_iteration=3).replace(
        num_data_shards=8, device_data_sharding="sharded")
    t = Trainer(cfg)
    state = t.train()
    assert int(state.step) == 3
    assert t._dev_data.shape[0] == 64
    assert t._dev_data.addressable_shards[0].data.shape[0] == 8


# ---------------------------------------------------------------------------
# RSS watchdog


def test_rss_watchdog_trips_and_checkpoints(tmp_path, monkeypatch):
    cfg = _cfg(str(tmp_path), data_placement="host", max_iteration=10,
               log_every=2, checkpoint_every=0, rss_limit_gb=0.5)
    t = Trainer(cfg)
    monkeypatch.setattr(Trainer, "_rss_gb", staticmethod(lambda: 99.0))
    state = t.train()
    stopped = int(state.step)
    assert stopped < 10                       # tripped early...
    assert t._rss_tripped
    restored = t.ckpt.restore(t.state)        # ...but checkpointed
    assert restored is not None and int(restored.step) == stopped


def test_rss_watchdog_auto_restart_reexecs(tmp_path, monkeypatch):
    cfg = _cfg(str(tmp_path), data_placement="host", max_iteration=10,
               log_every=2, rss_limit_gb=0.5, auto_restart=True)
    t = Trainer(cfg)
    monkeypatch.setattr(Trainer, "_rss_gb", staticmethod(lambda: 99.0))
    calls = []
    monkeypatch.setattr(t, "_reexec", lambda: calls.append(1))
    t.train()
    assert calls == [1]


def test_rss_watchdog_quiet_below_limit(tmp_path, monkeypatch):
    cfg = _cfg(str(tmp_path), data_placement="host", max_iteration=4,
               log_every=2, rss_limit_gb=1000.0, auto_restart=True)
    t = Trainer(cfg)
    calls = []
    monkeypatch.setattr(t, "_reexec", lambda: calls.append(1))
    state = t.train()
    assert int(state.step) == 4 and not t._rss_tripped and not calls


def test_device_data_mesh_stream_is_dispatch_invariant(tmp_path):
    """On a mesh, the gather rng is folded per MACRO-STEP inside the
    dispatch scan (it used to fold once per dispatch, making the data
    stream depend on steps_per_dispatch and dispatch-boundary layout):
    K=3 over the mesh must reproduce K=1 over the mesh bit-for-bit."""
    import jax.numpy as jnp

    from smmdax.train import (create_state, jit_train_step_device_data,
                              make_mesh)

    cfg = _cfg(str(tmp_path), batch_size=16, real_batch_size=16,
               device_data_pool=64).replace(num_data_shards=8)
    pool = jnp.asarray(np.random.default_rng(5).integers(
        0, 256, (64, 32, 32, 3), np.uint8))
    mesh = make_mesh(8)

    s1 = create_state(cfg, jax.random.PRNGKey(0))
    step_k1 = jit_train_step_device_data(cfg, 1, 1, mesh=mesh)
    for _ in range(3):
        s1, m1 = step_k1(s1, pool)

    s3 = create_state(cfg, jax.random.PRNGKey(0))
    step_k3 = jit_train_step_device_data(cfg, 1, 1, mesh=mesh,
                                         steps_per_dispatch=3)
    s3, m3 = step_k3(s3, pool)

    assert int(s3.step) == int(s1.step)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_mesh_rejects_oversubscription():
    """Requesting more shards than visible devices must raise, not
    silently truncate to lower parallelism."""
    import pytest

    from smmdax.train import make_mesh

    with pytest.raises(ValueError, match="devices"):
        make_mesh(jax.device_count() + 1)
