"""Trainer-loop and checkpoint/resume tests (SURVEY.md §5: exact resume
is a required property)."""

import os

import jax
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.checkpoint import CheckpointManager
from smmdax.train import create_state
from smmdax.trainer import Trainer


def _cfg(tmp, **kw):
    base = dict(dataset="gaussian_mix", architecture="mlp", model="mmd",
                kernel="gaussian", batch_size=32, max_iteration=6,
                dsteps=1, gsteps=1, start_dsteps=2, warmup_iterations=2,
                z_dim=4, dof_dim=4, log_every=3, sample_every=0,
                checkpoint_every=3, MMD_lr_scheduler=False,
                checkpoint_dir=os.path.join(tmp, "ck"),
                sample_dir=os.path.join(tmp, "s"),
                log_dir=os.path.join(tmp, "l"))
    base.update(kw)
    return Config(**base)


def test_train_loop_and_warmup(tmp_path):
    cfg = _cfg(str(tmp_path))
    t = Trainer(cfg)
    state = t.train()
    assert int(state.step) == 6
    # metrics jsonl written
    logs = os.listdir(cfg.log_dir)
    assert len(logs) == 1


def test_checkpoint_exact_resume(tmp_path):
    cfg = _cfg(str(tmp_path), max_iteration=4, checkpoint_every=2)
    state_a = Trainer(cfg).train()          # trains 4, ckpts at 2 and 4

    # new trainer resumes from step 4 and trains to 6
    cfg2 = cfg.replace(max_iteration=6)
    t2 = Trainer(cfg2)
    assert int(t2.state.step) == 4          # resumed
    # resumed state must be bit-identical to the in-memory end state
    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(t2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state_b = t2.train()
    assert int(state_b.step) == 6


def test_resume_continues_like_uninterrupted(tmp_path):
    """ckpt@2 then resume to 4 == straight run to 4 (exact-resume
    property: RNG, opt state, BN stats, SN u all carried)."""
    cfg_full = _cfg(str(tmp_path) + "/full", max_iteration=4,
                    checkpoint_every=100)
    full = Trainer(cfg_full).train()

    cfg_half = _cfg(str(tmp_path) + "/half", max_iteration=2,
                    checkpoint_every=2)
    Trainer(cfg_half).train()
    resumed = Trainer(cfg_half.replace(max_iteration=4)).train()

    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_steps_per_dispatch_trainer_parity(tmp_path):
    """The fused-dispatch trainer (K=3 against awkward boundaries:
    warm-up switch at 2, logging every 3, ckpt every 3, end at 7) must
    produce the BIT-identical final state to the K=1 trainer — dispatch
    clipping preserves every cadence and the scanned program preserves
    the math (VERDICT r3 item 1)."""
    cfg_1 = _cfg(str(tmp_path) + "/k1", max_iteration=7)
    s1 = Trainer(cfg_1).train()
    cfg_k = _cfg(str(tmp_path) + "/k3", max_iteration=7,
                 steps_per_dispatch=3)
    sk = Trainer(cfg_k).train()
    assert int(sk.step) == 7
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(sk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_steps_per_dispatch_exact_resume(tmp_path):
    """Exact resume still holds with K>1 (ckpt boundaries clip the
    dispatch; a resumed K>1 run continues the identical trajectory)."""
    cfg_full = _cfg(str(tmp_path) + "/full", max_iteration=6,
                    checkpoint_every=100, steps_per_dispatch=2)
    full = Trainer(cfg_full).train()
    cfg_half = _cfg(str(tmp_path) + "/half", max_iteration=3,
                    checkpoint_every=3, steps_per_dispatch=2)
    Trainer(cfg_half).train()
    resumed = Trainer(cfg_half.replace(max_iteration=6)).train()
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_on_device_data_trains_and_resumes_exactly(tmp_path):
    """on_device_data: batches synthesized in-program from the state
    RNG — no host pipeline at all — still trains, still exact-resumes
    (the data stream is a pure function of the checkpointed RNG)."""
    kw = dict(dataset="synthetic", architecture="dcgan", output_size=32,
              gf_dim=8, df_dim=8, batch_size=8, on_device_data=True,
              steps_per_dispatch=2)
    cfg_full = _cfg(str(tmp_path) + "/full", max_iteration=4,
                    checkpoint_every=100, **kw)
    full = Trainer(cfg_full).train()
    assert int(full.step) == 4
    cfg_half = _cfg(str(tmp_path) + "/half", max_iteration=2,
                    checkpoint_every=2, **kw)
    Trainer(cfg_half).train()
    resumed = Trainer(cfg_half.replace(max_iteration=4)).train()
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gen_feats_chunked_matches_shape_and_is_deterministic(tmp_path):
    """_gen_feats caps the image bytes materialized per scoring
    generation (a whole 25k x 160px f32 set is ~7.7 GB and OOMed a
    16 GB v5e at the first ema_eval_compare event).  The chunked path
    must produce the full (n, d) feature set, deterministically in the
    key, and single-chunk calls must equal the historical unchunked
    sample->extract arithmetic exactly."""
    from smmdax.eval.features import (extract_with_probs,
                                      get_feature_extractor)
    from smmdax.train import sample

    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=1,
               no_of_samples=64, checkpoint_every=0)
    t = Trainer(cfg)
    t.state = create_state(cfg, jax.random.PRNGKey(0))
    t._extractor = get_feature_extractor(cfg.data_dir)
    rng = jax.random.PRNGKey(42)

    # force chunking: cap to one batch worth of images
    t.SCORE_CHUNK_IMAGE_BYTES = (cfg.batch_size
                                 * int(np.prod(cfg.image_shape)) * 4)
    n = 3 * cfg.batch_size + 7          # non-multiple tail chunk
    f1, _ = t._gen_feats(t.state, rng, n)
    f2, _ = t._gen_feats(t.state, rng, n)
    assert f1.shape[0] == n
    assert np.all(np.isfinite(np.asarray(f1)))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # a different key changes the set
    f3, _ = t._gen_feats(t.state, jax.random.PRNGKey(43), n)
    assert not np.allclose(np.asarray(f1), np.asarray(f3))

    # single-chunk call == the historical unchunked path, bit for bit
    t.SCORE_CHUNK_IMAGE_BYTES = Trainer.SCORE_CHUNK_IMAGE_BYTES
    direct, _ = extract_with_probs(
        t._extractor, sample(cfg, t.state, rng, cfg.batch_size))
    helper, _ = t._gen_feats(t.state, rng, cfg.batch_size)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(helper))


def test_scoring_and_kid_scheduler(tmp_path):
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=2,
               compute_scores=True, score_every=1, no_of_samples=64,
               score_subset_size=64, score_subsets=4,
               MMD_lr_scheduler=True, checkpoint_every=0)
    t = Trainer(cfg)
    t.train()
    # scores were produced and the best-checkpoint machinery engaged
    assert t._best_feats is not None
    assert np.isfinite(t._best_kid)


def test_ema_eval_compare_scores_live_and_shadow(tmp_path):
    """cfg.ema_eval_compare: one run yields the PAIRED live-vs-EMA
    quality rows (fid_live/kid_live alongside the EMA fid/kid) — the
    shadow is passive, so this equals running the same seed twice with
    ema_decay 0 / >0, at half the cost and zero seed noise."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=3,
               compute_scores=True, score_every=0, no_of_samples=64,
               score_subset_size=64, score_subsets=4, checkpoint_every=0,
               ema_decay=0.5, ema_eval_compare=True)
    t = Trainer(cfg)
    t.train()
    scores = t._score(int(t.state.step))
    for k in ("fid", "kid", "fid_live", "kid_live"):
        assert k in scores and np.isfinite(scores[k]), (k, scores)
    # after a few updates the shadow trails the live weights, so the
    # paired scores must actually differ (same rng, same real set)
    assert scores["fid_live"] != scores["fid"]
    # and the comparison arm is absent when not requested
    cfg2 = cfg.replace(ema_eval_compare=False,
                       checkpoint_dir=os.path.join(str(tmp_path), "ck2"))
    t2 = Trainer(cfg2)
    t2.train()
    s2 = t2._score(int(t2.state.step))
    assert "fid_live" not in s2 and "kid_live" not in s2


def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training -> graceful checkpoint; next run resumes."""
    import os
    import signal
    import threading

    cfg = _cfg(str(tmp_path), max_iteration=2000, checkpoint_every=0,
               log_every=10_000)
    t = Trainer(cfg)
    # deliver SIGTERM to ourselves shortly after training starts
    timer = threading.Timer(1.5, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    state = t.train()
    timer.cancel()
    stopped_at = int(state.step)
    assert 0 < stopped_at < 2000          # stopped early, not at the end

    t2 = Trainer(cfg)
    assert int(t2.state.step) == stopped_at   # resumed from the preempt ckpt


def test_scheduler_resume_parity(tmp_path):
    """Interrupted == uninterrupted SCHEDULER decisions (round-2: the
    best-snapshot state is persisted via sidecar meta and rebuilt with
    the original step-keyed RNG, so resumed runs decay identically)."""
    kw = dict(dataset="synthetic", architecture="dcgan", output_size=32,
              gf_dim=8, df_dim=8, compute_scores=True, score_every=1,
              no_of_samples=64, score_subset_size=64, score_subsets=4,
              MMD_lr_scheduler=True)

    cfg_full = _cfg(str(tmp_path) + "/full", max_iteration=4,
                    checkpoint_every=100, **kw)
    t_full = Trainer(cfg_full)
    full = t_full.train()

    cfg_half = _cfg(str(tmp_path) + "/half", max_iteration=2,
                    checkpoint_every=2, **kw)
    Trainer(cfg_half).train()
    t_res = Trainer(cfg_half.replace(max_iteration=4))
    resumed = t_res.train()

    # identical LR trajectory endpoint and best-snapshot bookkeeping
    np.testing.assert_allclose(np.asarray(full.lr_d),
                               np.asarray(resumed.lr_d), rtol=0)
    np.testing.assert_allclose(np.asarray(full.lr_g),
                               np.asarray(resumed.lr_g), rtol=0)
    assert t_res._best_kid == pytest.approx(t_full._best_kid, rel=1e-6)
    assert t_full._best_feats is not None and t_res._best_feats is not None
    np.testing.assert_allclose(t_full._best_feats, t_res._best_feats,
                               rtol=1e-5, atol=1e-6)


def test_reload_best_on_decay(tmp_path, monkeypatch):
    """The scheduler's second arm: a failed three-sample test rewinds
    the model to the best snapshot AND decays the LR."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=2,
               compute_scores=True, score_every=1, no_of_samples=64,
               score_subset_size=64, score_subsets=4,
               MMD_lr_scheduler=True, reload_best_on_decay=True,
               three_sample_test="vote", scheduler_patience=1,
               checkpoint_every=0)
    t = Trainer(cfg)
    t.train()                                 # saves a best snapshot
    best = t.ckpt.restore_best(t.state)
    assert best is not None
    # params have moved past the best snapshot during training
    lr_before = float(t.state.lr_d)
    step_before = int(t.state.step)

    # force the decay arm: current KID is "not better" and the
    # three-sample test reports no improvement
    t._best_kid = -1.0
    import smmdax.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "relative_similarity_test",
                        lambda *a, **k: 0.0)
    out = t._score(step_before)

    assert out["lr_decayed"] == 1.0
    assert out.get("reloaded_best") == 1.0
    assert float(t.state.lr_d) == pytest.approx(lr_before * cfg.decay_rate)
    assert int(t.state.step) == step_before       # step/RNG not rewound
    for a, b in zip(jax.tree.leaves(t.state.g_params),
                    jax.tree.leaves(best.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pvalue_scheduler_arm(tmp_path, monkeypatch):
    """The Bounliphone relative-MMD arm (default three_sample_test):
    decay decisions are driven by the hypothesis-test p-value — a
    clearly-not-improved model decays, a clearly-improved one does not
    (VERDICT r2 item 6)."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=2,
               compute_scores=True, score_every=1, no_of_samples=64,
               score_subset_size=64, score_subsets=4,
               MMD_lr_scheduler=True, three_sample_test="pvalue",
               scheduler_patience=1, checkpoint_every=0)
    assert cfg.three_sample_test == "pvalue"
    t = Trainer(cfg)
    t.train()                                 # saves a best snapshot
    lr_before = float(t.state.lr_d)

    # current KID forced "not better" -> the p-value test decides
    t._best_kid = -1.0
    import smmdax.trainer as trainer_mod
    seen = {}

    def fake_test(ref, cur, best, **kw):
        seen.update(kw)
        return fake_test.p, 0.0

    monkeypatch.setattr(trainer_mod, "relative_mmd_test", fake_test)
    fake_test.p = 0.9                          # no significant improvement
    out = t._score(int(t.state.step))
    assert out["lr_decayed"] == 1.0
    assert out["three_sample_p"] == 0.9
    assert float(t.state.lr_d) == pytest.approx(lr_before * cfg.decay_rate)
    # step-keyed seeding (r2 weak #4) + the calibrated single-test
    # default (r3 weak #3): ONE Fisher-capable test at
    # scheduler_test_size clamped to the available features
    assert seen["seed"] == int(t.state.step)
    assert seen["n_subsets"] == cfg.scheduler_test_subsets == 1
    assert seen["subset_size"] == min(cfg.scheduler_test_size,
                                      cfg.no_of_samples)
    assert seen["combine"] == "fisher"

    fake_test.p = 0.01                         # significant improvement
    lr_now = float(t.state.lr_d)
    out = t._score(int(t.state.step))
    assert out["lr_decayed"] == 0.0
    assert float(t.state.lr_d) == pytest.approx(lr_now)


def test_scheduler_patience(tmp_path, monkeypatch):
    """scheduler_patience: only N CONSECUTIVE failed three-sample tests
    decay the LR; an improvement in between resets the counter (the
    lineage's protocol [R-MED]); the counter rides TrainState."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=2,
               compute_scores=True, score_every=1, no_of_samples=64,
               score_subset_size=64, score_subsets=4,
               MMD_lr_scheduler=True, three_sample_test="pvalue",
               scheduler_patience=2, checkpoint_every=0)
    t = Trainer(cfg)
    t.train()
    lr0 = float(t.state.lr_d)
    t._best_kid = -1.0                       # force the test path

    import smmdax.trainer as trainer_mod
    p_box = {"p": 0.9}
    monkeypatch.setattr(trainer_mod, "relative_mmd_test",
                        lambda *a, **k: (p_box["p"], 0.0))

    out = t._score(int(t.state.step))        # fail #1: no decay yet
    assert out["lr_decayed"] == 0.0 and out["sched_fails"] == 1.0
    assert float(t.state.lr_d) == pytest.approx(lr0)

    out = t._score(int(t.state.step))        # fail #2: patience reached
    assert out["lr_decayed"] == 1.0
    assert float(t.state.lr_d) == pytest.approx(lr0 * cfg.decay_rate)
    assert int(t.state.sched_fails) == 0     # reset after decay

    out = t._score(int(t.state.step))        # fail #1 of a new streak
    assert out["lr_decayed"] == 0.0
    p_box["p"] = 0.01
    out = t._score(int(t.state.step))        # improvement: counter resets
    assert out["lr_decayed"] == 0.0
    assert int(t.state.sched_fails) == 0
    p_box["p"] = 0.9
    out = t._score(int(t.state.step))        # fail #1 again, not #2
    assert out["lr_decayed"] == 0.0
    assert float(t.state.lr_d) == pytest.approx(lr0 * cfg.decay_rate)


def test_inloop_inception_score_logged_when_probs_available(tmp_path):
    """When the active extractor exposes class probs (the Inception
    extractor), in-loop scoring logs IS alongside FID/KID (SURVEY #10)."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=1,
               compute_scores=True, score_every=1, no_of_samples=32,
               score_subset_size=32, score_subsets=2,
               MMD_lr_scheduler=False, checkpoint_every=0)
    t = Trainer(cfg)
    t.train()

    class ProbsExtractor:
        name = "stub"
        feature_dim = 8

        def __call__(self, imgs):
            rng = np.random.default_rng(0)
            return rng.normal(size=(len(imgs), 8)).astype(np.float32)

        def probs(self, imgs):
            rng = np.random.default_rng(1)
            p = rng.uniform(0.1, 1.0, size=(len(imgs), 10))
            return (p / p.sum(axis=1, keepdims=True)).astype(np.float32)

    t._extractor = ProbsExtractor()
    t._real_feats = None
    out = t._score(1)
    assert "inception_score" in out and out["inception_score"] >= 1.0 - 1e-6
    assert "fid" in out and "kid" in out


def test_resume_with_legacy_best_checkpoint_no_meta(tmp_path):
    """A best checkpoint saved without the meta sidecar (pre-round-2
    format) must not be clobbered on resume: the scheduler re-scores the
    best snapshot instead of treating the current state as best."""
    import glob
    import os as _os

    kw = dict(dataset="synthetic", architecture="dcgan", output_size=32,
              gf_dim=8, df_dim=8, compute_scores=True, score_every=1,
              no_of_samples=64, score_subset_size=64, score_subsets=4,
              MMD_lr_scheduler=True, checkpoint_every=2, max_iteration=2)
    cfg = _cfg(str(tmp_path), **kw)
    t = Trainer(cfg)
    t.train()
    assert t._best_feats is not None

    # strip the meta (both the in-dir copy and any legacy sidecar)
    for p in glob.glob(_os.path.join(cfg.checkpoint_dir, cfg.run_name(),
                                     "best", "**", "meta.json"),
                       recursive=True):
        _os.remove(p)

    t2 = Trainer(cfg)                      # resumes from step 2
    assert int(t2.state.step) == 2
    assert t2.ckpt.best_meta() is None
    out = t2._score(int(t2.state.step))
    # the fallback rebuilt the comparison state from the stored best
    assert t2._best_feats is not None
    assert np.isfinite(t2._best_kid)
    assert "fid" in out


def test_save_best_recovers_from_orphaned_old_state(tmp_path):
    """A prior crash can leave ONLY best/state.old (between the two
    renames of the swap).  The next save_best must promote it first —
    never delete the sole surviving best checkpoint (ADVICE r2)."""
    cfg = _cfg(str(tmp_path))
    state = create_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.join(str(tmp_path), "ckbest"))
    mgr.save_best(state, meta={"best_kid": 1.0, "best_step": 1})
    best_dir = os.path.join(str(tmp_path), "ckbest", "best")
    # simulate the crash window: state renamed away, state.new never landed
    os.rename(os.path.join(best_dir, "state"),
              os.path.join(best_dir, "state.old"))
    assert mgr.restore_best(state) is not None       # .old is found
    # a fresh save must go through cleanly AND the pre-save state must
    # survive any point of it: promote-then-swap
    state2 = create_state(cfg, jax.random.PRNGKey(1))
    mgr.save_best(state2, meta={"best_kid": 0.5, "best_step": 2})
    restored = mgr.restore_best(state)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.d_params)[0]),
        np.asarray(jax.tree.leaves(state2.d_params)[0]))
    assert mgr.best_meta()["best_step"] == 2


def test_profiler_window_writes_trace(tmp_path):
    """cfg.profile_steps opens a jax.profiler window (SURVEY.md §5
    tracing row) and produces trace artifacts under log_dir/profile."""
    cfg = _cfg(str(tmp_path), max_iteration=4, profile_steps=2,
               profile_start=1, checkpoint_every=0)
    Trainer(cfg).train()
    prof_root = os.path.join(cfg.log_dir, "profile", cfg.run_name())
    found = []
    for root, _, files in os.walk(prof_root):
        found += [f for f in files if f.endswith((".pb", ".json.gz"))]
    assert found, f"no profiler artifacts under {prof_root}"


def test_tensorboard_writer_emits_event_files(tmp_path):
    """tensorboard=True writes tf.summary event files alongside JSONL."""
    pytest.importorskip("tensorflow")
    cfg = _cfg(str(tmp_path), max_iteration=3, tensorboard=True,
               checkpoint_every=0, log_every=1)
    Trainer(cfg).train()
    found = []
    for root, _, files in os.walk(cfg.log_dir):
        found += [f for f in files if "tfevents" in f]
    assert found, f"no event files under {cfg.log_dir}"


def test_scoring_with_data_parallel_mesh(tmp_path):
    """In-loop scoring composes with GSPMD data parallelism: the
    extractor shards its batch axis over the training mesh
    (single-device parity tested in test_eval/test_inception); FID and
    KID come out finite and the run completes."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, batch_size=16,
               num_data_shards=8, max_iteration=2, warmup_iterations=0,
               start_dsteps=1, compute_scores=True, score_every=2,
               no_of_samples=32, score_subset_size=16, score_subsets=2,
               checkpoint_every=0, log_every=2)
    t = Trainer(cfg)
    t.train()
    out = t._score(2)
    assert np.isfinite(out["fid"]) and np.isfinite(out["kid"])


def test_fresh_run_ignores_stale_best_checkpoint(tmp_path):
    """A fresh run in a checkpoint_dir holding only a dead run's BEST
    checkpoint (prior crash between a best-save and the first periodic
    save) must not adopt that stale best as its scheduler comparison
    state — only an actually-resumed run rebuilds it."""
    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=1,
               compute_scores=True, score_every=1, no_of_samples=64,
               score_subset_size=64, score_subsets=4,
               MMD_lr_scheduler=True, checkpoint_every=0)
    # dead run: wrote a best checkpoint at "step 2000", then crashed
    # with NO periodic checkpoint
    dead = Trainer(cfg)
    dead.ckpt.save_best(dead.state.replace(step=2000),
                        meta={"best_kid": 1e-9, "best_step": 2000})
    del dead

    t = Trainer(cfg)                        # fresh: restore() found no ckpt
    assert not t._resumed
    t.train()
    # the fresh run's first scoring event must have installed ITS OWN
    # best state, not compared against the dead run's kid=1e-9 bar
    meta = t.ckpt.best_meta()
    assert meta["best_step"] <= 1
    assert np.isfinite(t._best_kid) and t._best_kid > 1e-9


def test_improved_verdict_promotes_best_snapshot(tmp_path, monkeypatch):
    """When the three-sample test says the current model is
    significantly closer than the best snapshot, the current model
    BECOMES the best — otherwise a plateaued model defers decay forever
    against an ever-staler comparison target."""
    import smmdax.trainer as trainer_mod

    cfg = _cfg(str(tmp_path), dataset="synthetic", architecture="dcgan",
               output_size=32, gf_dim=8, df_dim=8, max_iteration=3,
               compute_scores=True, score_every=1, no_of_samples=64,
               score_subset_size=64, score_subsets=4,
               MMD_lr_scheduler=True, checkpoint_every=0,
               three_sample_test="pvalue", scheduler_patience=3)
    t = Trainer(cfg)
    # force the kid-comparison branch to lose and the significance test
    # to WIN at every event after the first
    monkeypatch.setattr(trainer_mod, "relative_mmd_test",
                        lambda *a, **k: (0.0, 10.0))
    calls = []
    real_save_best = t.ckpt.save_best
    monkeypatch.setattr(t.ckpt, "save_best",
                        lambda state, meta: (calls.append(meta),
                                             real_save_best(state, meta))[1])
    monkeypatch.setattr(trainer_mod, "kid_from_features",
                        lambda *a, **k: (0.5, 0.0))  # never beats best=0.5
    t._best_kid = 0.0                       # pre-seed an unbeatable bar
    t._best_feats = np.zeros((4, 8), np.float32)
    scores = t._score(1)
    assert scores["lr_decayed"] == 0.0
    # the improved verdict refreshed the best snapshot
    assert calls and calls[-1]["best_step"] == 1
    assert t._best_kid == 0.5


def test_log_every_zero_disables_logging(tmp_path):
    """log_every=0 means disabled (like every other cadence), not
    ZeroDivisionError."""
    cfg = _cfg(str(tmp_path), log_every=0, max_iteration=4)
    state = Trainer(cfg).train()
    assert int(state.step) == 4
