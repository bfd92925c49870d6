"""The training loop (SURVEY.md component #2 ``train()`` + #11 KID LR
scheduler): alternation scheduling, logging, sampling, checkpointing,
in-loop scoring, and the KID-driven learning-rate decay.

Reference call stack parity (§3.1): warm-up critic steps
(``start_dsteps`` for the first ``warmup_iterations``), periodic
sample grids, periodic checkpoints, periodic FID/KID scoring with the
three-sample-test LR decay.  All device work happens inside the two
jitted macro-step programs; this file is host-side orchestration only.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smmdax.checkpoint import CheckpointManager
from smmdax.configs import Config
from smmdax.data import make_dataset
from smmdax.data.pipeline import macro_batch_at
from smmdax.eval import (frechet_distance, gaussian_stats,
                         get_feature_extractor, kid_from_features)
from smmdax.eval.scores import relative_mmd_test, relative_similarity_test
from smmdax.train import (TrainState, create_state, jit_train_step,
                          make_mesh, sample)
from smmdax.utils import MetricWriter, StepTimer, save_images


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        from smmdax.train import enable_compilation_cache
        enable_compilation_cache()
        if cfg.debug_nans:
            # numerics harness: the TPU analog of the reference's
            # tf.check_numerics guards (SURVEY.md §5)
            jax.config.update("jax_debug_nans", True)
        if (cfg.with_scaling and cfg.scaling_grad_estimator == "exact"
                and cfg.output_size >= 64):
            # startup note, not an error (VERDICT r4 weak #5): exact-σ
            # is the paper-faithful default, but its dof_dim backward
            # passes cost ~6x step wall at 64px (BASELINE.md r4 LSUN
            # rehearsal row: 740 img/s exact vs ~5k hutchinson); the
            # unbiased one-probe estimator preserves training semantics
            print("[smmdax] note: scaling_grad_estimator='exact' at "
                  f"output_size={cfg.output_size} costs ~6x step time "
                  "(measured, BASELINE.md); consider "
                  "--scaling_grad_estimator hutchinson", flush=True)
        self.source = make_dataset(cfg)
        self.mesh = (make_mesh(cfg.num_data_shards)
                     if cfg.num_data_shards > 1 else None)
        self.state = create_state(cfg, jax.random.PRNGKey(cfg.random_seed))
        self.ckpt = CheckpointManager(
            os.path.join(cfg.checkpoint_dir, cfg.run_name()))
        restored = self.ckpt.restore(self.state)
        # whether THIS process actually resumed — gates the scheduler's
        # best-snapshot rebuild: a fresh run in a directory holding a
        # stale best checkpoint (prior run crashed between a best-save
        # and its first periodic save) must not adopt the dead run's
        # best state (step>0 at scoring time cannot distinguish these)
        self._resumed = restored is not None
        if restored is not None:
            self.state = restored
            print(f"[smmdax] resumed from step {int(self.state.step)}")
        self.writer = MetricWriter(cfg.log_dir, cfg.run_name(),
                                   also_stdout=cfg.log,
                                   tensorboard=cfg.tensorboard)
        # compiled step programs, keyed by (dsteps, steps_per_dispatch):
        # the warm-up and main alternation shapes, each possibly at
        # several dispatch depths (cfg.steps_per_dispatch clipped at
        # event boundaries — the periodic cadences yield a small set of
        # depths, each compiled once)
        self._step_cache: Dict[tuple, callable] = {}
        self._extractor = None
        # feature sets are host numpy on CPU, device jax.Arrays on an
        # accelerator (use_device_scoring) — scoring handles either
        self._real_feats: Optional[np.ndarray | jax.Array] = None
        self._real_stats: Optional[tuple] = None   # cached FID (mu, cov)
        self._best_feats: Optional[np.ndarray | jax.Array] = None
        self._best_kid: float = float("inf")
        # device-resident copies of the scoring feature sets, keyed by
        # role ("real"/"fake"/"best") — see _score_feats
        self._dev_feats: Dict[str, tuple] = {}

    # ------------------------------------------------------------------
    def _dsteps_at(self, step: int) -> int:
        if step < self.cfg.warmup_iterations and self.cfg.start_dsteps != self.cfg.dsteps:
            return self.cfg.start_dsteps
        return self.cfg.dsteps

    def _get_step(self, dsteps: int, k: int):
        """Compiled (and cached) program for one dispatch of ``k``
        macro-steps at the given critic-update count."""
        key = (dsteps, k)
        fn = self._step_cache.get(key)
        if fn is None:
            if self.cfg.data_placement == "device":
                from smmdax.train import jit_train_step_device_data
                fn = jit_train_step_device_data(
                    self.cfg, dsteps, self.cfg.gsteps, self.mesh,
                    mode=self.cfg.dp_mode, steps_per_dispatch=k)
            elif self.cfg.on_device_data:
                from smmdax.train import jit_train_step_on_device
                fn = jit_train_step_on_device(
                    self.cfg, dsteps, self.cfg.gsteps, self.mesh,
                    mode=self.cfg.dp_mode, steps_per_dispatch=k)
            else:
                fn = jit_train_step(self.cfg, dsteps, self.cfg.gsteps,
                                    self.mesh, mode=self.cfg.dp_mode,
                                    steps_per_dispatch=k)
            self._step_cache[key] = fn
        return fn

    def _next_boundary(self, step: int) -> int:
        """First step > ``step`` at which host-side work must observe
        the state: logging, sampling, checkpointing, scoring, fixed LR
        decay, the warm-up/main alternation switch, profiler window
        edges, and the end of training.  Dispatches never cross these,
        so every cadence behaves exactly as with steps_per_dispatch=1."""
        cfg = self.cfg
        cands = [cfg.max_iteration]
        if step < cfg.warmup_iterations and cfg.start_dsteps != cfg.dsteps:
            cands.append(cfg.warmup_iterations)
        periodic = [cfg.log_every, cfg.sample_every, cfg.checkpoint_every,
                    cfg.lr_decay_steps]
        if cfg.compute_scores:
            periodic.append(cfg.score_every)
        for every in periodic:
            if every:
                cands.append((step // every + 1) * every)
        if cfg.profile_steps:
            for edge in (cfg.profile_start,
                         cfg.profile_start + cfg.profile_steps):
                if edge > step:
                    cands.append(edge)
        return min(c for c in cands if c > step)

    def _score_feats(self, name: str, feats):
        """Device-resident copy of a feature set for the subset-sweep
        statistics (KID / three-sample tests), re-uploaded only when
        the host array object changes: the real set rides the link
        ONCE per run and the best set once per improvement instead of
        per scoring event (~200 MB each at 25k x 2048-d over the
        tunneled link).  Passthrough when the sweeps resolve to the
        host numpy oracle (CPU) — every numpy arm coerces internally,
        so semantics are unchanged either way."""
        from smmdax.eval.scores import use_device_scoring
        if feats is None or isinstance(feats, jax.Array):
            return feats                  # already device-resident
        if not use_device_scoring():
            return feats
        hit = self._dev_feats.get(name)
        if hit is not None and hit[0] is feats:
            return hit[1]
        dev = jnp.asarray(np.asarray(feats), jnp.float32)
        self._dev_feats[name] = (feats, dev)
        return dev

    # ceiling on the f32 image bytes a scoring generation may hold at
    # once: n full-size samples never materialize together (25k at
    # 160px is ~7.7 GB — a whole-set generation OOMed a 16 GB v5e at
    # the first ema_eval_compare event; features are (n, d) and tiny)
    SCORE_CHUNK_IMAGE_BYTES = 512 * 1024 * 1024

    def _gen_feats(self, state, rng, n: int, use_ema: bool = True):
        """Generate ``n`` eval-mode samples from ``state`` and return
        (features, probs) without ever materializing the full image
        set: generation is chunked so at most SCORE_CHUNK_IMAGE_BYTES
        of images exist at a time, and each chunk's images are dropped
        the moment its features are extracted.  When one chunk covers
        ``n`` (every <=64px config at the reference scoring sizes) the
        RNG stream and arithmetic are IDENTICAL to the historical
        unchunked path; larger sets fold the chunk index into the key.
        Both the original scoring pass and the resume-path best-feats
        rebuild use this helper, so step-keyed determinism (exact
        resume => bit-identical scheduler decisions) is preserved."""
        cfg = self.cfg
        from smmdax.eval.features import extract_with_probs
        from smmdax.eval.scores import use_device_scoring
        fetch = not use_device_scoring()
        per_img = int(np.prod(cfg.image_shape)) * 4
        chunk = max(cfg.batch_size,
                    (self.SCORE_CHUNK_IMAGE_BYTES // per_img)
                    // cfg.batch_size * cfg.batch_size)
        if chunk >= n:
            imgs = sample(cfg, state, rng, n, use_ema=use_ema)
            feats, probs = extract_with_probs(self._extractor, imgs,
                                              fetch=fetch)
            return feats, probs
        feats, probs = [], []
        for ci, lo in enumerate(range(0, n, chunk)):
            imgs = sample(cfg, state, jax.random.fold_in(rng, ci),
                          min(chunk, n - lo), use_ema=use_ema)
            f, p = extract_with_probs(self._extractor, imgs, fetch=fetch)
            del imgs
            feats.append(f)
            if p is not None:
                probs.append(p)
        cat = (jnp.concatenate if isinstance(feats[0], jax.Array)
               else np.concatenate)
        return cat(feats), (cat(probs) if probs else None)

    def _score(self, step: int) -> Dict[str, float]:
        """FID/KID of generated samples vs the real source + LR decay."""
        cfg = self.cfg
        if self._extractor is None:
            # data-parallel extraction over the training mesh (the net
            # is batch-parallel; GSPMD partitions the sweep)
            self._extractor = get_feature_extractor(cfg.data_dir,
                                                    mesh=self.mesh)
        # synthetic self-tests cap at 5000 samples; real datasets use the
        # configured count (the reference's 25k default)
        n = (min(cfg.no_of_samples, 5000) if cfg.dataset == "synthetic"
             else cfg.no_of_samples)
        rng = jax.random.PRNGKey(cfg.random_seed + step)
        # generated samples stay ON DEVICE and never materialize as a
        # whole set (chunked generate->extract, _gen_feats): the
        # extractor consumes each chunk where it was made, and only
        # (n, feature_dim) comes back to host — not the (n, H, W, C)
        # images (61 MB/event at 5000x32^2 over the tunneled link, or
        # 7.7 GB of HBM at 25k x 160^2).  One network sweep serves
        # FID/KID (features) and IS (probs); device FID stats / KID
        # sweeps / IS consume the features in place, and only sub-O(N)
        # statistics ever cross the host link
        from smmdax.eval.features import extract_features
        from smmdax.eval.scores import use_device_scoring
        use_dev = use_device_scoring()
        fake_feats, fake_probs = self._gen_feats(self.state, rng, n)
        if self._real_feats is None:
            # fixed key: the scoring reference set is identical across
            # resumes (exact-resume extends to scheduler decisions);
            # stays device-resident on an accelerator (no fetch +
            # re-upload of the ~200 MB set)
            self._real_feats = extract_features(
                self._extractor, self.source.batch(n, key=2**31 + 1),
                fetch=not use_dev)
            self._real_stats = None       # FID stats follow the set
        if (cfg.MMD_lr_scheduler and self._best_feats is None
                and self._resumed):
            # resumed run: rebuild the scheduler's best-snapshot state
            # from the persisted best checkpoint + sidecar meta.  The
            # best feats are re-derived with the SAME step-keyed RNG the
            # original scoring pass used, and best_kid comes from the
            # sidecar verbatim, so a resumed run makes bit-identical
            # scheduler decisions to an uninterrupted one.
            best_state = self.ckpt.restore_best(self.state)
            meta = self.ckpt.best_meta()
            if best_state is not None and meta is not None:
                self._best_feats, _ = self._gen_feats(
                    best_state,
                    jax.random.PRNGKey(cfg.random_seed
                                       + int(meta["best_step"])), n)
                self._best_kid = float(meta["best_kid"])
            elif best_state is not None:
                # legacy best checkpoint without meta: we can't recover
                # the original scoring RNG/KID, but we must NOT let the
                # first post-resume score clobber a genuinely better
                # snapshot — re-score the best snapshot now (fixed key)
                # and keep it as the comparison state
                self._best_feats, _ = self._gen_feats(
                    best_state, jax.random.PRNGKey(cfg.random_seed), n)
                self._best_kid = kid_from_features(
                    self._score_feats("real", self._real_feats),
                    self._score_feats("best", self._best_feats),
                    subset_size=min(cfg.score_subset_size, n),
                    n_subsets=cfg.score_subsets)[0]
        if self._real_stats is None:      # FID stats of the fixed real
            self._real_stats = gaussian_stats(   # set: computed once
                self._score_feats("real", self._real_feats)
                if use_dev else self._real_feats)
        fid = frechet_distance(*self._real_stats,
                               *gaussian_stats(fake_feats))
        kid, kid_std = kid_from_features(
            self._score_feats("real", self._real_feats),
            self._score_feats("fake", fake_feats),
            subset_size=min(cfg.score_subset_size, n),
            n_subsets=cfg.score_subsets)
        out = {"fid": fid, "kid": kid, "kid_std": kid_std}
        if fake_probs is not None:
            # Inception extractor: the reference logged IS alongside
            # FID/KID (SURVEY.md #10)
            from smmdax.eval import inception_score
            is_mean, is_std = inception_score(fake_probs)
            out["inception_score"] = is_mean
            out["inception_score_std"] = is_std
        if cfg.ema_decay > 0 and cfg.ema_eval_compare:
            # paired live-vs-EMA comparison from ONE run (the shadow is
            # passive, so the training trajectory equals an EMA-off
            # run's bit-for-bit): same step, same scoring RNG, same
            # real set — the EMA benefit isolated from seed noise.
            # The scheduler and best-tracking keep using the EMA (fid/
            # kid) scores; these rows are evidence only.
            live_feats, _ = self._gen_feats(self.state, rng, n,
                                            use_ema=False)
            out["fid_live"] = frechet_distance(*self._real_stats,
                                               *gaussian_stats(live_feats))
            out["kid_live"] = kid_from_features(
                self._score_feats("real", self._real_feats),
                self._score_feats("fake_live", live_feats),
                subset_size=min(cfg.score_subset_size, n),
                n_subsets=cfg.score_subsets)[0]

        if cfg.MMD_lr_scheduler:
            if self._best_feats is None or kid < self._best_kid:
                self._best_feats, self._best_kid = fake_feats, kid
                self.ckpt.save_best(self.state, meta={
                    "best_kid": float(kid), "best_step": int(step)})
                self.state = self.state.replace(
                    sched_fails=jnp.zeros((), jnp.int32))
                out["lr_decayed"] = 0.0
            else:
                # three-sample test vs best snapshot.  Subsets are
                # step-keyed so every scoring event draws fresh ones
                # (r2 weak #4: seed=0/n_subsets=10 correlated all
                # decisions), and cfg.score_subsets is honored.
                if cfg.three_sample_test == "pvalue":
                    # Bounliphone et al. relative-MMD hypothesis test:
                    # improvement = the test REJECTS "current is no
                    # closer than best" at scheduler_p_threshold.
                    # Default: ONE test at scheduler_test_size (the
                    # asymptotic p-value is then exactly calibrated —
                    # H0 rejection rate == threshold); with
                    # scheduler_test_subsets > 1 the subset p-values
                    # are Fisher-combined (round-3's mean-of-dependent-
                    # p-values had no interpretable significance level)
                    p_val, t_stat = relative_mmd_test(
                        self._score_feats("real", self._real_feats),
                        self._score_feats("fake", fake_feats),
                        self._score_feats("best", self._best_feats),
                        subset_size=min(cfg.scheduler_test_size, n),
                        n_subsets=cfg.scheduler_test_subsets, seed=step,
                        combine="fisher")
                    out["three_sample_p"] = p_val
                    out["three_sample_t"] = t_stat
                    improved = p_val < cfg.scheduler_p_threshold
                else:
                    win = relative_similarity_test(
                        self._score_feats("real", self._real_feats),
                        self._score_feats("fake", fake_feats),
                        self._score_feats("best", self._best_feats),
                        subset_size=min(cfg.score_subset_size, n),
                        n_subsets=cfg.score_subsets, seed=step)
                    out["three_sample_win"] = win
                    improved = win > 0.5
                if improved:
                    # the test just proved the current model is
                    # significantly closer to real than the best
                    # snapshot — promote it to BE the best (feats, kid,
                    # checkpoint).  Resetting patience while keeping
                    # the old snapshot would let a plateaued model
                    # defer decay forever by beating an ever-staler
                    # comparison target.
                    self._best_feats, self._best_kid = fake_feats, kid
                    self.ckpt.save_best(self.state, meta={
                        "best_kid": float(kid), "best_step": int(step)})
                    self.state = self.state.replace(
                        sched_fails=jnp.zeros((), jnp.int32))
                    out["lr_decayed"] = 0.0
                else:
                    # patience: decay only after scheduler_patience
                    # CONSECUTIVE failed tests (the lineage's protocol
                    # [R-MED]); counter rides TrainState so resumed
                    # runs reproduce the decision sequence exactly
                    fails = int(self.state.sched_fails) + 1
                    out["sched_fails"] = float(fails)
                    if fails < cfg.scheduler_patience:
                        self.state = self.state.replace(
                            sched_fails=jnp.asarray(fails, jnp.int32))
                        out["lr_decayed"] = 0.0
                        return out
                    new_lr_d = self.state.lr_d * cfg.decay_rate
                    new_lr_g = self.state.lr_g * cfg.decay_rate
                    if cfg.reload_best_on_decay:
                        # the reference's other scheduler arm: rewind
                        # the model to the best snapshot (keeping the
                        # current step count / RNG so the data stream
                        # and schedule are unaffected) and continue
                        # with the decayed LR
                        best_state = self.ckpt.restore_best(self.state)
                        if best_state is not None:
                            self.state = best_state.replace(
                                step=self.state.step, rng=self.state.rng)
                            out["reloaded_best"] = 1.0
                    self.state = self.state.replace(
                        lr_d=new_lr_d, lr_g=new_lr_g,
                        sched_fails=jnp.zeros((), jnp.int32))
                    out["lr_decayed"] = 1.0
        return out

    # ------------------------------------------------------------------
    def train(self) -> TrainState:
        cfg = self.cfg
        timer = StepTimer()
        step = int(self.state.step)

        # Preemption handling (SURVEY.md §5 failure-detection row): on
        # SIGTERM/SIGINT finish the in-flight step, checkpoint, and exit
        # cleanly; the next run auto-resumes from that checkpoint.
        import signal
        self._preempted = False
        self._rss_tripped = False

        if cfg.data_placement == "device":
            # the whole dataset rides the link ONCE; every batch after
            # is an in-program gather (see jit_train_step_device_data)
            from smmdax.data.pipeline import materialize_u8
            arr = materialize_u8(self.source, cfg.device_data_pool)
            if arr is None:
                raise ValueError(
                    f"data_placement=device needs an in-memory or "
                    f"pool-drawable dataset; {type(self.source).__name__} "
                    f"offers neither")
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                n = len(self.mesh.devices.flat)
                if cfg.device_data_sharding == "sharded" and n > 1:
                    # equal shards: drop the <n-sample remainder so every
                    # chip's slice (and thus the uniform marginal of the
                    # per-shard draws) has the same size
                    arr = arr[: (arr.shape[0] // n) * n]
                    spec = PartitionSpec("data")
                else:
                    spec = PartitionSpec()
                self._dev_data = jax.device_put(
                    arr, NamedSharding(self.mesh, spec))
            else:
                self._dev_data = jax.device_put(arr)
            mb = arr.nbytes / 2**20
            layout = (cfg.device_data_sharding if self.mesh is not None
                      else "single-chip")
            print(f"[smmdax] device-resident dataset: {arr.shape[0]} "
                  f"samples, {mb:.0f} MB uploaded once ({layout})")

        def _on_term(signum, frame):
            self._preempted = True

        try:
            old_term = signal.signal(signal.SIGTERM, _on_term)
            old_int = signal.signal(signal.SIGINT, _on_term)
        except ValueError:           # not the main thread (tests)
            old_term = old_int = None

        # Host-side prefetch: a producer thread assembles + quantizes
        # the NEXT macro-batches while the device runs the current step
        # (the reference's queue-runner role).  Batches stay a pure
        # function of (seed, step), so determinism/resume are unchanged.
        import queue
        import threading

        def _make_batch(s: int):
            warm = self._dsteps_at(s) == cfg.start_dsteps and \
                cfg.start_dsteps != cfg.dsteps
            per_step = (cfg.start_dsteps if warm else cfg.dsteps) + cfg.gsteps
            n = per_step * cfg.real_batch_size
            if cfg.uint8_transfer and hasattr(self.source, "batch_u8"):
                # raw uint8 straight from the dataset: skips both the
                # normalize-to-float and the re-quantize pass
                flat = self.source.batch_u8(n, key=s)
                batch = flat.reshape((per_step, cfg.real_batch_size)
                                     + flat.shape[1:])
            else:
                batch = macro_batch_at(self.source, s, per_step,
                                       cfg.real_batch_size)
                if cfg.uint8_transfer and batch.dtype == np.float32 \
                        and cfg.dataset != "gaussian_mix":
                    # quantize on host (images are 8-bit data anyway): 4x
                    # less host->device traffic; de-quantized in-step
                    batch = np.round((batch + 1.0) * 127.5).astype(np.uint8)
            return warm, batch

        # depth scales with the dispatch size: one full dispatch of
        # batches buffered ahead plus slack, so assembling the k-stack
        # never starves on the producer mid-dispatch
        q: "queue.Queue" = queue.Queue(
            maxsize=max(2, 2 * cfg.steps_per_dispatch))
        stop = threading.Event()

        def _producer(start: int):
            s = start
            while s < cfg.max_iteration and not stop.is_set():
                item = _make_batch(s)
                while not stop.is_set():
                    try:
                        q.put((s, item), timeout=0.5)
                        break
                    except queue.Full:
                        continue
                s += 1

        if not cfg.on_device_data and cfg.data_placement != "device":
            producer = threading.Thread(target=_producer, args=(step,),
                                        daemon=True)
            producer.start()

        try:
            self._train_loop(cfg, timer, step, q)
        finally:
            stop.set()
            if old_term is not None:
                signal.signal(signal.SIGTERM, old_term)
                signal.signal(signal.SIGINT, old_int)
        self.ckpt.save(int(self.state.step), jax.device_get(self.state),
                       wait=True)
        if self._rss_tripped and cfg.auto_restart:
            # state is checkpointed; replace the bloated process image
            # and let the fresh one auto-resume — long host-fed runs
            # self-heal instead of OOM-dying
            print("[smmdax] rss watchdog: re-exec to reclaim host memory")
            self._reexec()
        if cfg.dataset == "gaussian_mix" and cfg.sample_every:
            # stitch the per-interval witness frames into the animation
            # artifact (reference §3.5's matplotlib animation)
            from smmdax.viz import assemble_toy_animation
            gif = assemble_toy_animation(
                os.path.join(cfg.sample_dir, cfg.run_name()))
            if gif:
                print(f"[smmdax] toy animation: {gif}")
        return self.state

    def _train_loop(self, cfg, timer, step, q) -> None:
        while step < cfg.max_iteration:
            if self._preempted:
                print(f"[smmdax] preemption signal: checkpointing at step {step}")
                self.ckpt.save(step, jax.device_get(self.state), wait=True)
                break
            # one dispatch = up to steps_per_dispatch macro-steps fused
            # into a single transfer + XLA program, clipped so it never
            # crosses an event boundary (metrics cadence, sampling,
            # checkpoint, scoring and the warm-up switch are unaffected)
            k_eff = min(cfg.steps_per_dispatch, self._next_boundary(step) - step)
            if cfg.on_device_data or cfg.data_placement == "device":
                warm = self._dsteps_at(step) == cfg.start_dsteps and \
                    cfg.start_dsteps != cfg.dsteps
                # device placement: the resident dataset IS the batch
                # argument (committed, undonated); on_device_data: none
                batch = getattr(self, "_dev_data", None)
            else:
                parts = []
                warm = None
                for i in range(k_eff):
                    # bounded: a producer thread killed by a data error
                    # must fail loudly here, not hang the process while
                    # it holds the one-at-a-time TPU chip claim
                    s, (w, b) = q.get(timeout=600)
                    assert s == step + i, (s, step, i)
                    assert warm is None or warm == w   # boundary-clipped
                    warm = w
                    parts.append(b)
                # k_eff == 1 keeps the (per_step, B, ...) shape (no scan axis)
                batch = jnp.asarray(parts[0] if k_eff == 1
                                    else np.stack(parts))
            dsteps = cfg.start_dsteps if warm else cfg.dsteps
            step_fn = self._get_step(dsteps, k_eff)
            if cfg.profile_steps and step == cfg.profile_start:
                jax.profiler.start_trace(
                    os.path.join(cfg.log_dir, "profile", cfg.run_name()))
                self._trace_on = True
            self.state, metrics = (step_fn(self.state) if batch is None
                                   else step_fn(self.state, batch))
            step += k_eff
            if cfg.profile_steps and step == cfg.profile_start + cfg.profile_steps \
                    and getattr(self, "_trace_on", False):
                # the started-flag matters on resume: a checkpoint taken
                # INSIDE the window restarts past profile_start, so the
                # stop edge fires without a matching start_trace
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                self._trace_on = False
            timer.add(k_eff * (dsteps + cfg.gsteps) * cfg.real_batch_size)

            if cfg.lr_decay_steps and step % cfg.lr_decay_steps == 0:
                self.state = self.state.replace(
                    lr_d=self.state.lr_d * cfg.decay_rate,
                    lr_g=self.state.lr_g * cfg.decay_rate)

            if (cfg.log_every and step % cfg.log_every == 0) \
                    or step == cfg.max_iteration:
                jax.block_until_ready(metrics)
                m = {k: float(v) for k, v in metrics.items()}
                m["images_per_sec"] = timer.rate()
                self.writer.write(step, m)
                timer.reset()
                if cfg.rss_limit_gb and self._rss_gb() > cfg.rss_limit_gb:
                    # host RSS creeps on host-fed runs (per-transfer
                    # staging leak in the device client, BASELINE.md):
                    # trip the graceful preemption path BEFORE the OOM
                    # killer does it the hard way
                    print(f"[smmdax] rss watchdog: {self._rss_gb():.1f} GB"
                          f" > limit {cfg.rss_limit_gb} GB")
                    self._rss_tripped = True
                    self._preempted = True

            if cfg.sample_every and step % cfg.sample_every == 0:
                self._save_samples(step)

            if cfg.checkpoint_every and step % cfg.checkpoint_every == 0:
                self.ckpt.save(step, jax.device_get(self.state))

            if cfg.compute_scores and cfg.score_every \
                    and step % cfg.score_every == 0:
                scores = self._score(step)
                self.writer.write(step, scores)

    @staticmethod
    def _rss_gb() -> float:
        """Current process resident set, in GB (Linux)."""
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 2**20
        except OSError:
            pass
        return 0.0

    def _reexec(self) -> None:
        """Replace this process with a fresh copy of itself (same argv);
        the new process resumes from the checkpoint just written.
        Separate method so tests can stub it."""
        import sys
        os.execv(sys.executable, [sys.executable] + sys.argv)

    def _save_samples(self, step: int) -> None:
        cfg = self.cfg
        out_dir = os.path.join(cfg.sample_dir, cfg.run_name())
        if cfg.dataset == "gaussian_mix":
            # toy: histogram + witness-function frame (reference §3.5)
            from smmdax.nn import build_models
            from smmdax.viz import plot_toy_frame
            _, disc = build_models(cfg)
            variables = {"params": self.state.d_params,
                         "spectral": self.state.d_spectral}
            critic = lambda x: disc.apply(variables, x, update_sn=False)
            fake = np.asarray(sample(cfg, self.state,
                                     jax.random.PRNGKey(step), 2048))
            real = self.source.batch(2048, key=2**31)  # off the step-key range
            plot_toy_frame(cfg, critic, real, fake, step, out_dir)
            return
        imgs = np.asarray(sample(cfg, self.state,
                                 jax.random.PRNGKey(step), 64))
        save_images(imgs, os.path.join(out_dir, f"sample_{step:07d}.png"))


def train(cfg: Config) -> TrainState:
    return Trainer(cfg).train()
