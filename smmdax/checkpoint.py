"""Orbax checkpointing (SURVEY.md §5 checkpoint/resume row).

Replaces the reference's ``tf.train.Saver`` with orbax: the FULL
training state is saved — generator/critic params, BOTH Adam states,
BatchNorm running stats, the spectral-norm ``u`` vectors, the RNG key,
the dynamic learning rates and the step — so resume is exact
(SURVEY.md demands an exact-resume test).  A separate "best" checkpoint
is kept for the KID LR scheduler's three-sample comparisons
(component #11).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from smmdax.train import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best_dir = os.path.join(directory, "best")
        # ONE StandardCheckpointer reused by every save_best/restore_best:
        # constructing one per call leaks its async machinery (threads)
        # across the scheduler's many best-saves on long runs
        self._best_ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: TrainState, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def save_best(self, state: TrainState,
                  meta: Optional[dict] = None) -> None:
        """Overwrite the 'best so far' checkpoint (KID scheduler).

        ``meta`` (e.g. ``{"best_kid": ..., "best_step": ...}``) is
        written INSIDE the state directory before the directory swap,
        so state and meta can never be observed mismatched, and a crash
        at any point leaves a complete previous (state, meta) pair —
        a resumed run reconstructs the scheduler's comparison state
        exactly, including the RNG key the best snapshot was scored
        with (keyed by step).
        """
        import json
        import shutil
        ckptr = self._best_ckptr
        path = os.path.join(self._best_dir, "state")
        path_new, path_old = path + ".new", path + ".old"
        if os.path.exists(path_old) and not os.path.exists(path):
            # a prior crash landed between the two renames: state.old is
            # the ONLY complete pair — promote it before anything is
            # deleted, so a second crash during this save can never
            # leave us with no best checkpoint at all
            os.rename(path_old, path)
        for p in (path_new, path_old):
            if os.path.exists(p):
                shutil.rmtree(p)
        ckptr.save(path_new, state)
        ckptr.wait_until_finished()
        if meta is not None:
            with open(os.path.join(path_new, "meta.json"), "w") as f:
                json.dump(meta, f)
        # near-atomic swap: at every instant either `state` or
        # `state.old` is a complete pair (recovery in _best_state_dir)
        if os.path.exists(path):
            os.rename(path, path_old)
        os.rename(path_new, path)
        if os.path.exists(path_old):
            shutil.rmtree(path_old)

    def _best_state_dir(self) -> Optional[str]:
        path = os.path.join(self._best_dir, "state")
        if os.path.exists(path):
            return path
        if os.path.exists(path + ".old"):     # crashed mid-swap
            return path + ".old"
        return None

    def best_meta(self) -> Optional[dict]:
        import json
        d = self._best_state_dir()
        candidates = ([os.path.join(d, "meta.json")] if d else []) + [
            os.path.join(self._best_dir, "meta.json")]   # legacy sidecar
        for path in candidates:
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)
        return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @staticmethod
    def _restore_with_ema_migration(do_restore, abstract_state: TrainState
                                    ) -> TrainState:
        """Bridge TrainState pytree-structure changes from toggling
        ``ema_decay`` across a resume (ADVICE r4): orbax restores by
        structure, so a pre-EMA checkpoint into an EMA-enabled run (or
        the reverse) fails with an opaque structure mismatch.

        * EMA now ON, checkpoint has no shadow -> restore without the
          shadow slot, then backfill ``e_0 = p_0`` from the restored
          live params (exactly create_state's initialization, so the
          recurrence restarts from the restored weights).
        * EMA now OFF, checkpoint carries a shadow -> restore with a
          shadow-shaped slot, then drop it (the live weights continue
          training; the stale shadow is discarded, not served).

        Checkpoints come in vintages (no shadows / params shadow only,
        before the BN-stats shadow existed / both shadows), and orbax
        distinguishes a field saved as ``None`` (key present, empty)
        from a field that did not exist when the checkpoint was written
        (key absent) — so each vintage needs TWO candidate templates: a
        TrainState with the slot set to None, and a plain field dict
        with the key genuinely absent (orbax matches key paths, not
        container types, and the dict round-trip preserves nested
        NamedTuple/opt-state structure — verified against a real
        params-only-vintage 160px checkpoint).  Shadow-shaped template
        slots alias the live leaves instead of copying: works for
        concrete states AND abstract ShapeDtypeStruct trees (jnp.copy
        on the latter would raise here and mask ``exc``); restored
        values overwrite or are dropped, so aliasing is safe.
        """
        FIELDS = list(abstract_state.__dataclass_fields__)

        _KEEP_NONE = object()   # key present with a None value (a slot
                                # saved by an EMA-off run of newer code)

        def dict_template(**slots):
            d = {n: getattr(abstract_state, n) for n in FIELDS}
            for k, v in slots.items():
                if v is None:
                    d.pop(k)            # key genuinely absent on disk
                elif v is _KEEP_NONE:
                    d[k] = None
                else:
                    d[k] = v
            return d

        def as_state(out) -> TrainState:
            if isinstance(out, dict):
                return abstract_state.replace(
                    **{k: v for k, v in out.items()})
            return out

        try:
            return do_restore(abstract_state)
        except Exception as exc:
            if abstract_state.g_params_ema is not None:
                # EMA on now; checkpoint narrower.  Params-only vintage
                # first (the common case: a run resumed across the
                # stats-shadow upgrade), then fully pre-EMA; None-key
                # form before absent-key form within each.
                candidates = (
                    (abstract_state.replace(g_stats_ema=None), False),
                    (dict_template(g_stats_ema=None), False),
                    (abstract_state.replace(g_params_ema=None,
                                            g_stats_ema=None), True),
                    (dict_template(g_params_ema=None,
                                   g_stats_ema=None), True),
                    # EMA-off checkpoint from stats-shadow-less code:
                    # params slot saved as None, stats key absent
                    (dict_template(g_params_ema=_KEEP_NONE,
                                   g_stats_ema=None), True),
                )
            else:
                # EMA off now; checkpoint carries shadows to drop.
                # Both-shadow vintage, then params-only (None-key and
                # absent-key stats forms).
                candidates = (
                    (abstract_state.replace(
                        g_params_ema=abstract_state.g_params,
                        g_stats_ema=abstract_state.g_batch_stats), False),
                    (abstract_state.replace(
                        g_params_ema=abstract_state.g_params), False),
                    (dict_template(g_params_ema=abstract_state.g_params,
                                   g_stats_ema=None), False),
                    # ...and fully pre-EMA absent-key checkpoints (the
                    # direct attempt fails on None-key-vs-absent-key)
                    (dict_template(g_params_ema=None,
                                   g_stats_ema=None), False),
                    # ...and EMA-off checkpoints from stats-shadow-less
                    # code (params slot saved as None, stats key absent)
                    (dict_template(g_params_ema=_KEEP_NONE,
                                   g_stats_ema=None), False),
                )
            for cand, backfill_params in candidates:
                try:
                    out = as_state(do_restore(cand))
                except Exception:
                    continue
                if abstract_state.g_params_ema is None:
                    return out.replace(g_params_ema=None, g_stats_ema=None)
                if backfill_params or out.g_params_ema is None:
                    out = out.replace(g_params_ema=jax.tree.map(
                        jnp.copy, out.g_params))
                return out.replace(g_stats_ema=jax.tree.map(
                    jnp.copy, out.g_batch_stats))
            raise exc  # original mismatch was not the EMA slots

    def restore(self, abstract_state: TrainState,
                step: Optional[int] = None) -> Optional[TrainState]:
        """Restore latest (or a given step); None if nothing saved."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._restore_with_ema_migration(
            lambda a: self._mgr.restore(step, args=ocp.args.StandardRestore(a)),
            abstract_state)

    def restore_best(self, abstract_state: TrainState) -> Optional[TrainState]:
        path = self._best_state_dir()
        if path is None:
            return None
        return self._restore_with_ema_migration(
            lambda a: self._best_ckptr.restore(path, target=a),
            abstract_state)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._best_ckptr.close()
        self._mgr.close()
