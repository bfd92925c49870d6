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
