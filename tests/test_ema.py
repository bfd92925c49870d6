"""Generator weight EMA (cfg.ema_decay > 0): shadow recurrence math,
eval-path switching, K-dispatch invariance, exact checkpoint resume and
DP replication.  Beyond-reference capability (standard GAN serving
discipline: score/sample/export the smoothed weights, train the live
ones); disabled by default so every reference-parity path is unchanged.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.checkpoint import CheckpointManager
from smmdax.configs import Config
from smmdax.data import make_dataset
from smmdax.data.pipeline import macro_batches
from smmdax.train import (TrainState, create_state, eval_g_params,
                          eval_g_stats, jit_train_step, make_mesh, sample)


def _tiny_cfg(**kw):
    base = dict(model="mmd", kernel="rq", dataset="synthetic", batch_size=8,
                output_size=32, gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                dsteps=1, gsteps=1, ema_decay=0.5)
    base.update(kw)
    return Config(**base)


def _batches(cfg, n):
    ds = make_dataset(cfg)
    it = macro_batches(ds, cfg.dsteps + cfg.gsteps, cfg.batch_size)
    return [jnp.asarray(next(it)) for _ in range(n)]


def test_ema_off_by_default():
    cfg = _tiny_cfg(ema_decay=0.0)
    state = create_state(cfg, jax.random.PRNGKey(0))
    assert state.g_params_ema is None
    # eval params fall back to the live generator
    assert eval_g_params(state) is state.g_params
    # and the step runs exactly as before (no EMA leaves in the carry)
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    state, m = step(state, _batches(cfg, 1)[0])
    assert state.g_params_ema is None
    assert np.isfinite(float(m["d_loss_mmd2"]))


def test_ema_recurrence_matches_manual():
    """e_t = d*e_{t-1} + (1-d)*p_t with e_0 = p_0 (init copy), applied
    once per generator update — replayed by hand from the live params
    observed after each macro-step."""
    cfg = _tiny_cfg(ema_decay=0.5)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    expected = jax.tree.map(np.asarray, state.g_params)  # e_0 = p_0
    d = cfg.ema_decay
    for batch in _batches(cfg, 3):
        state, _ = step(state, batch)
        p = jax.tree.map(np.asarray, state.g_params)
        expected = jax.tree.map(lambda e, q: d * e + (1 - d) * q,
                                expected, p)
    got = jax.tree.map(np.asarray, state.g_params_ema)
    for e, g in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(e, g, rtol=1e-5, atol=1e-6)
    # the shadow trails the live params (it is not just a copy)
    diffs = [float(np.abs(e - p).max()) for e, p in zip(
        jax.tree.leaves(got), jax.tree.leaves(
            jax.tree.map(np.asarray, state.g_params)))]
    assert max(diffs) > 0


def test_sample_uses_ema_weights():
    cfg = _tiny_cfg(ema_decay=0.9)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    for batch in _batches(cfg, 2):
        state, _ = step(state, batch)
    rng = jax.random.PRNGKey(3)
    ema_imgs = np.asarray(sample(cfg, state, rng, 8))
    live_imgs = np.asarray(sample(cfg, state, rng, 8, use_ema=False))
    # same rng, different weights -> different images
    assert not np.allclose(ema_imgs, live_imgs)
    # use_ema=True is exactly "live params swapped for the shadow"
    swapped = state.replace(g_params=state.g_params_ema, g_params_ema=None)
    np.testing.assert_array_equal(
        ema_imgs, np.asarray(sample(cfg, swapped, rng, 8)))


def test_ema_k_dispatch_invariance():
    """steps_per_dispatch=2 produces the same shadow as two K=1 steps
    (the EMA update rides the scanned macro-step body)."""
    cfg = _tiny_cfg(ema_decay=0.5)
    batches = _batches(cfg, 2)

    s1 = create_state(cfg, jax.random.PRNGKey(0))
    step1 = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    for b in batches:
        s1, _ = step1(s1, b)

    s2 = create_state(cfg, jax.random.PRNGKey(0))
    step2 = jit_train_step(cfg, cfg.dsteps, cfg.gsteps, steps_per_dispatch=2)
    s2, _ = step2(s2, jnp.stack(batches))

    for a, b in zip(jax.tree.leaves(s1.g_params_ema),
                    jax.tree.leaves(s2.g_params_ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_ema_checkpoint_roundtrip(tmp_path):
    """The shadow is part of TrainState: save/restore preserves it
    bit-for-bit, and a resumed step continues the recurrence exactly."""
    cfg = _tiny_cfg(ema_decay=0.5)
    batches = _batches(cfg, 2)
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)

    state = create_state(cfg, jax.random.PRNGKey(0))
    state, _ = step(state, batches[0])
    mgr = CheckpointManager(os.path.join(str(tmp_path), "ck"))
    mgr.save(1, state, wait=True)

    abstract = create_state(cfg, jax.random.PRNGKey(0))
    restored = mgr.restore(abstract)
    mgr.close()
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state.g_params_ema),
                    jax.tree.leaves(restored.g_params_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cont, _ = step(restored, batches[1])
    straight, _ = step(state, batches[1])
    for a, b in zip(jax.tree.leaves(cont.g_params_ema),
                    jax.tree.leaves(straight.g_params_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_stats_shadow_recurrence_and_eval_pairing():
    """The BN-stats shadow follows the same recurrence as the weight
    shadow, and eval-mode generation serves the (weights, stats) shadow
    PAIR — pairing the lagged weight shadow with LIVE running stats
    degenerated at 160px once training moved through a violent region
    (BASELINE.md r5 CelebA row: EMA KID 0.137 -> 1.65, live 0.010)."""
    cfg = _tiny_cfg(ema_decay=0.5)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    expected = jax.tree.map(np.asarray, state.g_batch_stats)  # e_0 = s_0
    d = cfg.ema_decay
    for batch in _batches(cfg, 3):
        state, _ = step(state, batch)
        s = jax.tree.map(np.asarray, state.g_batch_stats)
        expected = jax.tree.map(lambda e, q: d * e + (1 - d) * q,
                                expected, s)
    got = jax.tree.map(np.asarray, state.g_stats_ema)
    assert jax.tree.leaves(got)  # the tiny generator does carry BN stats
    for e, g in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(e, g, rtol=1e-5, atol=1e-6)
    assert eval_g_stats(state) is state.g_stats_ema
    # sample(use_ema=True) is exactly "live slots swapped for the pair"
    rng = jax.random.PRNGKey(3)
    paired = state.replace(g_params=state.g_params_ema,
                           g_batch_stats=state.g_stats_ema,
                           g_params_ema=None, g_stats_ema=None)
    np.testing.assert_array_equal(
        np.asarray(sample(cfg, state, rng, 8)),
        np.asarray(sample(cfg, paired, rng, 8)))


def test_restore_params_only_ema_checkpoint_backfills_stats(tmp_path):
    """Vintage bridge: checkpoints written before the BN-stats shadow
    existed carry g_params_ema but no g_stats_ema — restore keeps the
    params shadow bit-for-bit and backfills the stats shadow from the
    restored live running averages, then the resumed step runs."""
    cfg = _tiny_cfg(ema_decay=0.5)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    state, _ = step(state, _batches(cfg, 1)[0])
    vintage = state.replace(g_stats_ema=None)      # the old structure
    mgr = CheckpointManager(os.path.join(str(tmp_path), "ck"))
    mgr.save(1, vintage, wait=True)
    mgr.save_best(vintage)

    abstract = create_state(cfg, jax.random.PRNGKey(0))
    for restored in (mgr.restore(abstract), mgr.restore_best(abstract)):
        assert restored is not None
        for a, b in zip(jax.tree.leaves(state.g_params_ema),
                        jax.tree.leaves(restored.g_params_ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for s, e in zip(jax.tree.leaves(restored.g_batch_stats),
                        jax.tree.leaves(restored.g_stats_ema)):
            np.testing.assert_array_equal(np.asarray(s), np.asarray(e))
    restored = mgr.restore(abstract)
    mgr.close()
    cont, m = step(restored, _batches(cfg, 1)[0])
    assert np.isfinite(float(m["d_loss_mmd2"]))
    assert cont.g_stats_ema is not None


def test_restore_absent_key_vintage_checkpoints(tmp_path):
    """Checkpoints written by code where an EMA field did not EXIST
    lack the key entirely on disk — orbax treats that differently from
    a key saved with a None value, so the migration's dict-template
    candidates must bridge it (found against a real pre-stats-shadow
    160px checkpoint).  Simulated here by saving plain field dicts with
    the keys genuinely absent."""
    import orbax.checkpoint as ocp

    cfg = _tiny_cfg(ema_decay=0.5)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    state, _ = step(state, _batches(cfg, 1)[0])

    fields = {n: getattr(state, n) for n in state.__dataclass_fields__}
    params_only = {k: v for k, v in fields.items() if k != "g_stats_ema"}
    pre_ema = {k: v for k, v in fields.items()
               if k not in ("g_params_ema", "g_stats_ema")}
    mgr = CheckpointManager(os.path.join(str(tmp_path), "ck"))
    mgr._mgr.save(1, args=ocp.args.StandardSave(params_only))
    mgr._mgr.save(2, args=ocp.args.StandardSave(pre_ema))
    mgr._mgr.wait_until_finished()

    abstract = create_state(cfg, jax.random.PRNGKey(0))
    # params-only vintage: shadow kept bit-for-bit, stats backfilled
    r1 = mgr.restore(abstract, step=1)
    for a, b in zip(jax.tree.leaves(state.g_params_ema),
                    jax.tree.leaves(r1.g_params_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for s, e in zip(jax.tree.leaves(r1.g_batch_stats),
                    jax.tree.leaves(r1.g_stats_ema)):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(e))
    # pre-EMA vintage: BOTH shadows backfilled from the restored state
    r2 = mgr.restore(abstract, step=2)
    for p, e in zip(jax.tree.leaves(r2.g_params),
                    jax.tree.leaves(r2.g_params_ema)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(e))
    # and into an EMA-off config both vintages restore shadow-free
    cfg_off = _tiny_cfg(ema_decay=0.0)
    abstract_off = create_state(cfg_off, jax.random.PRNGKey(0))
    for s in (1, 2):
        r = mgr.restore(abstract_off, step=s)
        assert r.g_params_ema is None and r.g_stats_ema is None
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(r.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_ema_missing_shadow_raises_at_trace():
    """ADVICE r4: ema_decay > 0 with a shadowless state must fail
    loudly at trace time, not silently serve live weights."""
    cfg = _tiny_cfg(ema_decay=0.5)
    state = create_state(cfg, jax.random.PRNGKey(0)).replace(
        g_params_ema=None)  # e.g. built under a different cfg
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    with pytest.raises(ValueError, match="EMA shadow"):
        step(state, _batches(cfg, 1)[0])


def test_restore_pre_ema_checkpoint_backfills_shadow(tmp_path):
    """ADVICE r4: toggling ema_decay ON across a resume — the old
    no-EMA checkpoint restores with the shadow backfilled e_0 = p_0
    (create_state's init), and the resumed step runs."""
    cfg_off = _tiny_cfg(ema_decay=0.0)
    state = create_state(cfg_off, jax.random.PRNGKey(0))
    step_off = jit_train_step(cfg_off, cfg_off.dsteps, cfg_off.gsteps)
    state, _ = step_off(state, _batches(cfg_off, 1)[0])
    mgr = CheckpointManager(os.path.join(str(tmp_path), "ck"))
    mgr.save(1, state, wait=True)
    mgr.save_best(state)

    cfg_on = _tiny_cfg(ema_decay=0.5)
    abstract = create_state(cfg_on, jax.random.PRNGKey(0))
    for restored in (mgr.restore(abstract), mgr.restore_best(abstract)):
        assert restored is not None
        assert restored.g_params_ema is not None
        for p, e in zip(jax.tree.leaves(restored.g_params),
                        jax.tree.leaves(restored.g_params_ema)):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(e))
    restored = mgr.restore(abstract)
    mgr.close()
    # live params survived the migration bit-for-bit
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    step_on = jit_train_step(cfg_on, cfg_on.dsteps, cfg_on.gsteps)
    cont, m = step_on(restored, _batches(cfg_on, 1)[0])
    assert np.isfinite(float(m["d_loss_mmd2"]))
    assert cont.g_params_ema is not None


def test_restore_ema_checkpoint_into_no_ema_run_drops_shadow(tmp_path):
    """The reverse toggle: an EMA checkpoint restores into a no-EMA
    config with the stale shadow dropped, live weights intact."""
    cfg_on = _tiny_cfg(ema_decay=0.5)
    state = create_state(cfg_on, jax.random.PRNGKey(0))
    step_on = jit_train_step(cfg_on, cfg_on.dsteps, cfg_on.gsteps)
    state, _ = step_on(state, _batches(cfg_on, 1)[0])
    mgr = CheckpointManager(os.path.join(str(tmp_path), "ck"))
    mgr.save(1, state, wait=True)

    cfg_off = _tiny_cfg(ema_decay=0.0)
    abstract = create_state(cfg_off, jax.random.PRNGKey(0))
    restored = mgr.restore(abstract)
    mgr.close()
    assert restored is not None
    assert restored.g_params_ema is None
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    step_off = jit_train_step(cfg_off, cfg_off.dsteps, cfg_off.gsteps)
    _, m = step_off(restored, _batches(cfg_off, 1)[0])
    assert np.isfinite(float(m["d_loss_mmd2"]))


def test_interpolate_use_ema_escape_hatch():
    """ADVICE r4: interpolate() honors use_ema like sample() does."""
    from smmdax.train import interpolate
    cfg = _tiny_cfg(ema_decay=0.9)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    for batch in _batches(cfg, 2):
        state, _ = step(state, batch)
    rng = jax.random.PRNGKey(7)
    ema_grid = np.asarray(interpolate(cfg, state, rng, rows=2, cols=3))
    live_grid = np.asarray(interpolate(cfg, state, rng, rows=2, cols=3,
                                       use_ema=False))
    assert not np.allclose(ema_grid, live_grid)
    swapped = state.replace(g_params=state.g_params_ema, g_params_ema=None)
    np.testing.assert_array_equal(
        ema_grid, np.asarray(interpolate(cfg, swapped, rng, rows=2, cols=3)))


@pytest.mark.parametrize("mode", ["gspmd", "shard_map"])
def test_ema_replicated_on_mesh(mode):
    """One step on the 8-device mesh: the shadow equals the
    single-device recurrence (elementwise update on replicated values
    stays replicated; no collective needed)."""
    cfg = _tiny_cfg(ema_decay=0.5, batch_size=16,
                    use_ring_mmd=(mode == "shard_map"))
    batch = _batches(cfg, 1)[0]

    s_single = create_state(cfg, jax.random.PRNGKey(0))
    step_s = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)
    s_single, _ = step_s(s_single, batch)

    mesh = make_mesh(8)
    cfg_m = cfg.replace(num_data_shards=8)
    s_mesh = create_state(cfg_m, jax.random.PRNGKey(0))
    step_m = jit_train_step(cfg_m, cfg_m.dsteps, cfg_m.gsteps, mesh=mesh,
                            mode=mode)
    s_mesh, _ = step_m(s_mesh, batch)

    # gspmd: identical estimator -> identical shadow (f32 tolerance).
    # shard_map rides the ring estimator, whose value/grad equal the
    # dense oracle to f32 reduction tolerance (the repo invariant), so
    # the shadow must match the single-device recurrence too — just
    # with the looser ring tolerance (ADVICE r4: finite-only left
    # cross-shard EMA replication untested in that mode).
    tol = dict(rtol=2e-4, atol=2e-5) if mode == "gspmd" else \
        dict(rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_single.g_params_ema),
                    jax.tree.leaves(s_mesh.g_params_ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    for leaf in jax.tree.leaves(s_mesh.g_params_ema):
        assert np.isfinite(np.asarray(leaf)).all()
