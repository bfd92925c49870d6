"""Jitted training step + trainer loop (SURVEY.md component #2).

Re-design of the reference's ``MMD_GAN`` class (core/model.py): the TF1
graph/session/queue-runner machinery becomes

* an immutable ``TrainState`` pytree (params, opt states, BN stats,
  spectral-norm ``u`` vectors, RNG key, dynamic learning rates),
* one jitted ``train_step`` per (dsteps, gsteps) shape that runs the
  full d/g alternation of a macro-step as a single XLA program
  (``lax.scan`` over critic updates, then generator updates), and
* data parallelism by GSPMD: the step is written in GLOBAL-batch terms
  and jitted with batch inputs sharded over a 1-D ``Mesh('data')`` and
  state replicated.  XLA inserts the ICI collectives — the B_g x B_g
  kernel matrix of the global batch, the psum of replicated-param
  gradients, and cross-replica BatchNorm reductions all fall out of the
  sharding annotations (the [SPEC] "MMD estimator sees the full global
  batch" requirement).

Spectral-norm power iteration runs ONCE per critic update, outside the
loss autodiff, on a dummy forward (the update depends only on weights),
so applying the critic several times inside one loss (real / fake /
interpolates / Jacobian) cannot multi-step ``u`` — and because params
are replicated, ``u`` stays bit-identical across shards (SURVEY.md §7
hard-part #4).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmdax.configs import Config
from smmdax.losses import LossAux, critic_loss, generator_loss
from smmdax.nn import build_models

Array = jnp.ndarray


class TrainState(struct.PyTreeNode):
    step: Array                       # int32 scalar
    rng: Array                        # PRNG key
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Any
    d_spectral: Any
    d_opt_state: Any
    lr_g: Array                       # dynamic (KID scheduler decays these
    lr_d: Array                       #  without recompiling)
    sched_fails: Array = None         # int32: consecutive failed three-
                                      # sample tests (scheduler patience
                                      # state; in TrainState so resume
                                      # reproduces decay decisions exactly)
    g_params_ema: Any = None          # EMA shadow of g_params when
                                      # cfg.ema_decay > 0, else None (an
                                      # empty pytree node: jit signatures,
                                      # scan carries and orbax checkpoints
                                      # are unchanged when EMA is off)
    g_stats_ema: Any = None           # EMA shadow of g_batch_stats, same
                                      # recurrence: eval-mode generation
                                      # from the weight shadow must use
                                      # normalizer statistics of the SAME
                                      # epoch.  Pairing the lagged weight
                                      # shadow with LIVE BN stats
                                      # degenerated at 160px once the
                                      # live weights moved through a
                                      # violent region (CelebA r5 run:
                                      # EMA KID 0.137 -> 1.65 while live
                                      # stayed at 0.010)


def _adam(cfg: Config) -> optax.GradientTransformation:
    # scale_by_adam only: the learning rate is applied manually from the
    # dynamic state.lr_* scalars (reference: MMD_lr_scheduler decays LR
    # mid-run; we must not bake it into the compiled program).
    return optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2)


def create_state(cfg: Config, rng: jax.Array) -> TrainState:
    gen, disc = build_models(cfg)
    rng, gk, dk, sk = jax.random.split(rng, 4)
    z = jnp.zeros((2, cfg.z_dim), jnp.float32)
    img = jnp.zeros((2,) + cfg.image_shape, jnp.float32)

    g_vars = gen.init({"params": gk}, z, train=True)
    d_vars = disc.init({"params": dk}, img)

    g_params = g_vars["params"]
    g_batch_stats = dict(g_vars.get("batch_stats", {}))
    d_params = d_vars["params"]
    d_spectral = dict(d_vars.get("spectral", {}))

    adam = _adam(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=sk,
        g_params=g_params,
        g_batch_stats=g_batch_stats,
        g_opt_state=adam.init(g_params),
        d_params=d_params,
        d_spectral=d_spectral,
        d_opt_state=adam.init(d_params),
        lr_g=jnp.asarray(cfg.lr_g, jnp.float32),
        lr_d=jnp.asarray(cfg.lr_d, jnp.float32),
        sched_fails=jnp.zeros((), jnp.int32),
        g_params_ema=(jax.tree.map(jnp.copy, g_params)
                      if cfg.ema_decay > 0 else None),
        g_stats_ema=(jax.tree.map(jnp.copy, g_batch_stats)
                     if cfg.ema_decay > 0 else None),
    )


# ---------------------------------------------------------------------------
# single-update building blocks (written in GLOBAL batch terms)


def _generate(gen, cfg: Config, g_params, g_batch_stats, z: Array,
              update_stats: bool) -> Tuple[Array, Any]:
    variables = {"params": g_params, "batch_stats": g_batch_stats}
    fake, updated = gen.apply(variables, z, train=True, mutable=["batch_stats"])
    new_stats = dict(updated.get("batch_stats", g_batch_stats))
    return fake, (new_stats if update_stats else g_batch_stats)


def _critic_fn(disc, d_params, d_spectral,
               remat: bool = False) -> Callable[[Array], Array]:
    variables = {"params": d_params, "spectral": d_spectral}
    fn = lambda x: disc.apply(variables, x, update_sn=False)
    if remat:
        # trade HBM for FLOPs: recompute the conv stack in backward
        # passes instead of storing activations (jax.checkpoint
        # composes with higher-order AD for the witness-GP / SMMD-σ
        # double-backprop paths).  Measured on v5e-16GB: B=64 fits
        # WITHOUT remat even at 160px and recompute costs ~30% wall
        # (110.3→84.9 ms at 64px, 358.5→276.6 at 160px) — enable only
        # when a config actually OOMs
        fn = jax.checkpoint(fn)
    return fn


def _refresh_spectral(disc, cfg: Config, d_params, d_spectral) -> Any:
    """One power-iteration step for every SN layer (weights-only)."""
    if not cfg.with_sn:
        return d_spectral
    dummy = jnp.zeros((1,) + cfg.image_shape, jnp.float32)
    _, updated = disc.apply({"params": d_params, "spectral": d_spectral},
                            dummy, update_sn=True, mutable=["spectral"])
    return updated["spectral"]


def _apply_update(adam, grads, params, opt_state, lr):
    updates, opt_state = adam.update(grads, opt_state, params)
    params = optax.apply_updates(
        params, jax.tree.map(lambda u: -lr * u, updates))
    return params, opt_state


def _fake_count(cfg: Config, axis_name) -> int:
    """Generated-batch size (global in GSPMD code, per-shard inside
    shard_map).  The reference exposes batch_size (fake) and
    real_batch_size independently; both are GLOBAL batch sizes here."""
    if axis_name is None:
        return cfg.batch_size
    return cfg.batch_size // jax.lax.axis_size(axis_name)


def _shard_rng(rng: jax.Array, axis_name) -> jax.Array:
    """Distinct RNG stream per data shard (inside shard_map)."""
    if axis_name is None:
        return rng
    return jax.random.fold_in(rng, jax.lax.axis_index(axis_name))


def _pmean_tree(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.tree.map(lambda v: jax.lax.pmean(v, axis_name), tree)


def _d_update(cfg: Config, gen, disc, adam, state: TrainState,
              real: Array, rng: jax.Array,
              axis_name=None) -> Tuple[TrainState, LossAux]:
    rng_z, rng_gp = jax.random.split(_shard_rng(rng, axis_name))
    z = jax.random.uniform(rng_z, (_fake_count(cfg, axis_name), cfg.z_dim),
                           minval=-1.0, maxval=1.0)
    fake, _ = _generate(gen, cfg, state.g_params, state.g_batch_stats, z,
                        update_stats=False)
    fake = jax.lax.stop_gradient(fake)

    d_spectral = _refresh_spectral(disc, cfg, state.d_params, state.d_spectral)

    def loss_fn(d_params):
        critic = _critic_fn(disc, d_params, d_spectral, remat=cfg.remat)
        return critic_loss(cfg, critic, real, fake, rng_gp,
                           axis_name=axis_name)

    grads, aux = jax.grad(loss_fn, has_aux=True)(state.d_params)
    grads = _pmean_tree(grads, axis_name)
    d_params, d_opt_state = _apply_update(
        adam, grads, state.d_params, state.d_opt_state, state.lr_d)
    return state.replace(d_params=d_params, d_opt_state=d_opt_state,
                         d_spectral=d_spectral), aux


def _g_update(cfg: Config, gen, disc, adam, state: TrainState,
              real: Array, rng: jax.Array,
              axis_name=None) -> Tuple[TrainState, LossAux]:
    rng_z, rng_scale = jax.random.split(_shard_rng(rng, axis_name))
    z = jax.random.uniform(rng_z,
                           (_fake_count(cfg, axis_name), cfg.z_dim),
                           minval=-1.0, maxval=1.0)
    critic = _critic_fn(disc, state.d_params, state.d_spectral,
                        remat=cfg.remat)

    def loss_fn(g_params):
        fake, new_stats = _generate(gen, cfg, g_params, state.g_batch_stats,
                                    z, update_stats=True)
        loss, aux = generator_loss(cfg, critic, real, fake,
                                   axis_name=axis_name, rng=rng_scale)
        return loss, (aux, new_stats)

    grads, (aux, new_stats) = jax.grad(loss_fn, has_aux=True)(state.g_params)
    grads = _pmean_tree(grads, axis_name)
    # per-shard BN batch statistics are averaged so the replicated
    # state stays replicated (local-stats normalization, synced EMA)
    new_stats = _pmean_tree(new_stats, axis_name)
    g_params, g_opt_state = _apply_update(
        adam, grads, state.g_params, state.g_opt_state, state.lr_g)
    g_params_ema = state.g_params_ema
    g_stats_ema = state.g_stats_ema
    if cfg.ema_decay > 0 and (g_params_ema is None or g_stats_ema is None):
        # trace-time guard (ADVICE r4): a silently skipped EMA update
        # would serve LIVE weights from every eval path while the config
        # promises smoothed ones — fail loudly instead.  States from
        # create_state(cfg) always carry both shadows; a pre-EMA (or
        # params-only-EMA) checkpoint is backfilled on restore
        # (CheckpointManager).
        raise ValueError(
            f"cfg.ema_decay={cfg.ema_decay} but the TrainState EMA "
            "shadows are missing: the state was built or restored under "
            "a config without EMA — rebuild via create_state(cfg, ...) "
            "or restore through CheckpointManager (which backfills them)")
    if cfg.ema_decay > 0:  # shadows' presence guaranteed by the guard
        # shadow updates AFTER the optimizer step; elementwise on
        # replicated values, so they stay replicated under every DP mode
        # without a collective.  The BN-stats shadow uses the SAME
        # recurrence so eval-mode generation pairs epoch-consistent
        # weights and normalizer statistics.
        d = cfg.ema_decay
        g_params_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                    g_params_ema, g_params)
        g_stats_ema = jax.tree.map(lambda e, s: d * e + (1.0 - d) * s,
                                   g_stats_ema, new_stats)
    return state.replace(g_params=g_params, g_opt_state=g_opt_state,
                         g_batch_stats=new_stats,
                         g_params_ema=g_params_ema,
                         g_stats_ema=g_stats_ema), aux


# ---------------------------------------------------------------------------
# the fused macro-step


def build_train_step(cfg: Config, dsteps: int, gsteps: int,
                     axis_name=None
                     ) -> Callable[[TrainState, Array], Tuple[TrainState, Dict[str, Array]]]:
    """One XLA program: ``dsteps`` critic updates then ``gsteps``
    generator updates, consuming ``real`` of shape
    (dsteps + gsteps, B_global, H, W, C) — or the per-shard slice of it
    when ``axis_name`` is set (shard_map ring mode)."""
    gen, disc = build_models(cfg)
    adam = _adam(cfg)

    def train_step(state: TrainState, real: Array):
        if real.dtype == jnp.uint8:
            # uint8 host->device transfer (4x less PCIe/tunnel traffic);
            # the exact-endpoint normalize fuses into the first conv pass
            from smmdax.data.transforms import normalize_uint8
            real = normalize_uint8(real)
        rng, *step_rngs = jax.random.split(state.rng, 1 + dsteps + gsteps)
        state = state.replace(rng=rng)

        def d_body(state, inp):
            batch, r = inp
            state, aux = _d_update(cfg, gen, disc, adam, state, batch, r,
                                   axis_name=axis_name)
            return state, aux

        d_rngs = jnp.stack(step_rngs[:dsteps])
        state, d_aux = jax.lax.scan(
            d_body, state, (real[:dsteps], d_rngs))

        def g_body(state, inp):
            batch, r = inp
            state, aux = _g_update(cfg, gen, disc, adam, state, batch, r,
                                   axis_name=axis_name)
            return state, aux

        g_rngs = jnp.stack(step_rngs[dsteps:])
        state, g_aux = jax.lax.scan(
            g_body, state, (real[dsteps:dsteps + gsteps], g_rngs))

        state = state.replace(step=state.step + 1)
        metrics = {
            "d_loss_mmd2": d_aux.mmd2[-1],
            "d_sigma": d_aux.sigma[-1],
            "d_gp": d_aux.gp[-1],
            "d_ratio": d_aux.ratio[-1],
            "g_loss": g_aux.ratio[-1] if cfg.model != "wgan-gp" else -g_aux.critic_fake[-1],
            "g_mmd2": g_aux.mmd2[-1],
            "critic_real": d_aux.critic_real[-1],
            "critic_fake": d_aux.critic_fake[-1],
            "lr_d": state.lr_d,
            "lr_g": state.lr_g,
        }
        return state, metrics

    return train_step


def macro_step_flops(cfg: Config, dsteps: int, gsteps: int) -> Optional[float]:
    """FLOPs of ONE macro-step (``dsteps`` critic + ``gsteps`` generator
    updates) for MFU accounting.

    XLA's HLO cost analysis counts a while/scan body ONCE regardless of
    trip count (measured: dsteps=1/2/5 lowerings of the production
    scanned step report IDENTICAL flops), so analysing the production
    program undercounts the d/g alternation roughly
    (dsteps*d_flops + gsteps*g_flops)/(d_flops + g_flops)-fold — ~3x at
    the flagship 5d+1g.  This oracle re-expresses the same macro-step
    math as a straight-line Python-unrolled program and reads ITS cost
    analysis from the lowered IR (abstract args — nothing is compiled
    or executed).  Returns None where the backend offers no analysis.

    Accounting basis: pre-optimization IR.  Measured against the
    compiled (post-optimization) analysis of the same unrolled program
    on a tiny flagship-shaped config: +2.6% (5.32e10 vs 5.18e10), i.e.
    MFU figures derived from this oracle carry a <~3% optimistic bound
    from not-yet-eliminated dead code — far below the ~3x undercount
    this oracle exists to fix.
    """
    # Force the dense loss path: a pallas_call lowers to an opaque
    # custom call that cost analysis scores as 0 FLOPs (silently
    # undercounting exactly the big-batch configs), and Mosaic kernels
    # cannot lower for the CPU-fallback attempt below.  The dense path
    # computes the same math, which is what MFU should charge for.
    cfg = cfg.replace(use_pallas="off")
    gen, disc = build_models(cfg)
    adam = _adam(cfg)

    def unrolled(state: TrainState, real: Array):
        from smmdax.data.transforms import normalize_uint8
        real = normalize_uint8(real)
        rng, *step_rngs = jax.random.split(state.rng, 1 + dsteps + gsteps)
        state = state.replace(rng=rng)
        d_aux = g_aux = None
        for i in range(dsteps):
            state, d_aux = _d_update(cfg, gen, disc, adam, state,
                                     real[i], step_rngs[i])
        for j in range(gsteps):
            state, g_aux = _g_update(cfg, gen, disc, adam, state,
                                     real[dsteps + j], step_rngs[dsteps + j])
        state = state.replace(step=state.step + 1)
        return state, (d_aux.mmd2, g_aux.mmd2)

    state = jax.eval_shape(lambda k: create_state(cfg, k),
                           jax.random.PRNGKey(0))
    batch = jax.ShapeDtypeStruct(
        (dsteps + gsteps, cfg.real_batch_size) + cfg.image_shape, jnp.uint8)
    return _ir_flops(unrolled, state, batch)


def _ir_flops(fn, *abstract_args) -> Optional[float]:
    """Pre-optimization FLOPs of ``fn(*abstract_args)`` from lowered-IR
    cost analysis, cheapest source first; None if no source offers a
    count.  See ``macro_step_flops`` for the accounting basis (and its
    caveat: scan bodies are counted ONCE — callers must pass
    straight-line programs)."""

    def _flops_of(ca) -> Optional[float]:
        if isinstance(ca, (list, tuple)):          # older jax returns [dict]
            ca = ca[0] if ca else {}
        if not ca:
            return None
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None

    # Analysis sources, cheapest first.  On the remote-TPU (axon)
    # backend the LOWERED analysis returns None (measured) while the
    # COMPILED one works but costs a multi-minute tunnel compile — so
    # in between, try a CPU lowering of the same program: pre-opt flop
    # counting is platform-agnostic (verified identical to the
    # compiled-TPU count on a matmul probe) and needs no compile.
    try:
        flops = _flops_of(jax.jit(fn).lower(*abstract_args)
                          .cost_analysis())
        if flops is not None:
            return flops
    except Exception:
        pass
    try:
        # NOTE: jit's backend= kwarg is deprecated (warns on jax 0.9);
        # kept because it is the only public no-compile way to get a
        # CPU cost analysis today (trace().lower(lowering_platforms=
        # ('cpu',)).cost_analysis() returns None — measured).  If a
        # jax upgrade removes the kwarg, we fall through LOUDLY below.
        flops = _flops_of(jax.jit(fn, backend="cpu")
                          .lower(*abstract_args).cost_analysis())
        if flops is not None:
            return flops
    except Exception as e:
        print(f"# _ir_flops: CPU-lowering fallback failed ({e!r:.120}); "
              "falling back to a FULL compile for cost analysis — "
              "minutes per config on a tunneled TPU")
    try:
        return _flops_of(jax.jit(fn).lower(*abstract_args)
                         .compile().cost_analysis())
    except Exception:
        return None


def sample_flops(cfg: Config, n: int) -> Optional[float]:
    """FLOPs of ``sample(cfg, state, rng, n)`` for generator-MFU
    accounting.  The eval-mode generator apply is straight-line (no
    scan), so unlike the train step no unrolling is needed: one
    batch-sized chunk is analysed and multiplied by the number of
    chunks ``sample`` dispatches (the trailing concat + slice are free
    at cost-analysis precision)."""
    cfg = cfg.replace(use_pallas="off")
    gen, _ = build_models(cfg)
    state = jax.eval_shape(lambda k: create_state(cfg, k),
                           jax.random.PRNGKey(0))
    z = jax.ShapeDtypeStruct((cfg.batch_size, cfg.z_dim), jnp.float32)

    def gen_apply(g_params, g_batch_stats, zz):
        return gen.apply({"params": g_params, "batch_stats": g_batch_stats},
                         zz, train=False)

    per_chunk = _ir_flops(gen_apply, state.g_params, state.g_batch_stats, z)
    if per_chunk is None:
        return None
    return per_chunk * (-(-n // cfg.batch_size))


def enable_compilation_cache(path: str = "~/.cache/smmdax_xla") -> None:
    """Persistent XLA compilation cache: first compile through the
    remote-compile tunnel costs minutes; subsequent processes reuse the
    serialized executable.  Safe no-op where unsupported."""
    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def make_mesh(num_shards: int) -> Mesh:
    devices = jax.devices()
    if len(devices) < num_shards:
        # a silent [:num_shards] truncation would train at lower
        # parallelism than configured with no error anywhere downstream
        # (divisibility checks key on the actual mesh)
        raise ValueError(
            f"num_data_shards={num_shards} but only {len(devices)} "
            f"devices are visible")
    import numpy as np
    return Mesh(np.array(devices[:num_shards]), ("data",))


def _scan_dispatches(step, k: int):
    """Fuse ``k`` macro-steps into one XLA program: ``real`` gains a
    leading dispatch axis (k, dsteps+gsteps, B, ...) and the macro-step
    is lax.scan'ed over it — ONE host->device transfer and ONE dispatch
    per k steps, with the per-step math (and therefore the resulting
    state) bit-identical to k separate calls.  Metrics returned are the
    last macro-step's (the trainer aligns dispatch boundaries with
    logging steps)."""
    if k == 1:
        return step

    def multi(state: TrainState, reals: Array):
        state, metrics = jax.lax.scan(step, state, reals)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return multi


def jit_train_step(cfg: Config, dsteps: int, gsteps: int,
                   mesh: Optional[Mesh] = None, mode: str = "gspmd",
                   steps_per_dispatch: int = 1):
    """Jit the macro-step with data sharded over the mesh, state replicated.

    With ``mesh=None`` (or 1 device) this is a plain single-chip jit.

    ``mode``:
      * ``gspmd`` — global-batch code + sharding annotations; XLA
        partitions and inserts collectives (default).
      * ``shard_map`` — explicit per-shard program: per-shard RNG
        streams, ring/gathered global-batch MMD (cfg.use_ring_mmd),
        pmean'd gradients and BN stats.  Same estimator, explicit
        collective schedule (SURVEY.md §5 ring row).

    ``steps_per_dispatch`` > 1 scans that many macro-steps inside the
    one program; ``real`` then carries a leading dispatch axis
    (k, dsteps+gsteps, B, ...).
    """
    k = steps_per_dispatch
    if mesh is None or len(mesh.devices.flat) == 1:
        # pin the shard count to reality here too: a stale DP config
        # (num_data_shards>1) on a single-device execution would
        # otherwise make losses._pallas refuse the fused path even
        # under use_pallas='on' (it never traces pallas_call where
        # GSPMD might partition — but this program is single-device)
        cfg = cfg.replace(num_data_shards=1)
        step = _scan_dispatches(build_train_step(cfg, dsteps, gsteps), k)
        return jax.jit(step, donate_argnums=(0,))
    # The execution context is THIS mesh, whatever cfg.num_data_shards
    # says (mesh and mode are independent arguments): pin the config's
    # shard count to the mesh so trace-time dispatch decisions — the
    # never-trace-pallas_call-inside-a-GSPMD-program guard in
    # losses._pallas — key on reality, not on a possibly-stale config.
    cfg = cfg.replace(num_data_shards=len(mesh.devices.flat))
    batch_spec = P(None, "data") if k == 1 else P(None, None, "data")
    if mode == "shard_map":
        from jax.experimental.shard_map import shard_map
        n = len(mesh.devices.flat)
        if cfg.batch_size % n or cfg.real_batch_size % n:
            raise ValueError(
                f"shard_map mode needs batch sizes divisible by the mesh "
                f"({cfg.batch_size}/{cfg.real_batch_size} vs {n} shards)")
        step = _scan_dispatches(
            build_train_step(cfg, dsteps, gsteps, axis_name="data"), k)
        smapped = shard_map(step, mesh=mesh,
                            in_specs=(P(), batch_spec),
                            out_specs=(P(), P()),
                            check_rep=False)
        return jax.jit(smapped, donate_argnums=(0,))
    step = _scan_dispatches(build_train_step(cfg, dsteps, gsteps), k)
    replicated = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, batch_spec)   # shard global batch dim
    return jax.jit(step,
                   in_shardings=(replicated, data_sharding),
                   out_shardings=(replicated, replicated),
                   donate_argnums=(0,))


def jit_train_step_on_device(cfg: Config, dsteps: int, gsteps: int,
                             mesh: Optional[Mesh] = None,
                             mode: str = "gspmd",
                             steps_per_dispatch: int = 1):
    """The train step with IN-PROGRAM batch synthesis: real batches are
    drawn on-device from the state's RNG chain — zero host->device
    transfer, zero host work.  ``step(state) -> (state, metrics)``.

    Two uses:
    * link-independent measurement (VERDICT r2 weak #2): the tunneled
      link adds 2-3x run-to-run swings to large-image wall times; with
      data synthesized in-program the measurement is the device-bound
      framework cost alone (tools/bench_large.py, BASELINE.md rows).
    * ``on_device_data`` hostless smoke training.  NOTE: the draws are
      uniform noise, NOT the host SyntheticImages distribution —
      scoring against the host source would be meaningless, so the
      config rejects ``compute_scores`` with this flag.

    Determinism/resume are preserved, and K-invariance holds: the
    batch for macro-step s is drawn INSIDE the scan body from that
    step's ``state.rng`` (folded on a fixed tag), so it is a pure
    function of the RNG chain — the same at any ``steps_per_dispatch``
    and across resumes (both tested).
    """
    per_step = dsteps + gsteps
    shape = (per_step, cfg.real_batch_size) + cfg.image_shape

    if mesh is not None and len(mesh.devices.flat) > 1:
        base = jit_train_step(cfg, dsteps, gsteps, mesh=mesh, mode=mode,
                              steps_per_dispatch=steps_per_dispatch)

        def synth_multi(state: TrainState):
            # multi-device path keeps the one-draw-per-dispatch shape
            # (the per-step chain below would need per-shard plumbing);
            # measurement mode only
            rng = jax.random.fold_in(state.rng, 0x0DDDA7A)
            full = shape if steps_per_dispatch == 1 \
                else (steps_per_dispatch,) + shape
            real = jax.random.uniform(rng, full, minval=-1.0, maxval=1.0)
            return base(state, real)

        return jax.jit(synth_multi, donate_argnums=(0,))

    single = build_train_step(cfg, dsteps, gsteps)

    def synth_step(state: TrainState, _):
        # folded on a constant so the data stream is independent of the
        # per-update rngs the step itself splits from state.rng
        rng = jax.random.fold_in(state.rng, 0x0DDDA7A)
        real = jax.random.uniform(rng, shape, minval=-1.0, maxval=1.0)
        return single(state, real)

    def synth(state: TrainState):
        if steps_per_dispatch == 1:
            return synth_step(state, None)
        state, metrics = jax.lax.scan(synth_step, state, None,
                                      length=steps_per_dispatch)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return jax.jit(synth, donate_argnums=(0,))


def _batch_indices(rng: jax.Array, pool_n: int, per_step: int,
                   nb: int) -> Array:
    """(per_step, nb) device-gather indices, WITHOUT replacement within
    each batch row.

    A duplicate sample INSIDE one batch perturbs the unbiased
    U-statistic's independence assumption (the K_XX off-diagonal sum
    then contains k(x, x) self-terms, biasing MMD^2_u upward — at
    B=1024 on a 50k pool ~21 batches per run carry a duplicate), so
    each update's batch is a uniform without-replacement draw; rows
    are independent, so a sample may recur ACROSS updates like any
    epoch-free stream... almost: when the whole macro-step fits the
    pool (the production case) ONE pool permutation is sliced into
    disjoint rows — duplicate-free within rows AND across the
    macro-step — because a single threefry argsort costs ~6x less
    than per-row choice(replace=False) draws (measured: per-row
    choices cost 2.7% of flagship throughput, 15.2k vs 15.7k img/s;
    the single-permutation form is one argsort per macro-step).
    Oversized macro-steps (per_step*nb > pool) fall back to
    independent per-row draws; pools SMALLER than the batch
    (toy/fixture datasets) necessarily repeat samples and keep the
    with-replacement draw.
    """
    if pool_n < nb:
        keys = jax.random.split(rng, per_step)
        return jax.vmap(
            lambda k: jax.random.randint(k, (nb,), 0, pool_n))(keys)
    if per_step * nb <= pool_n:
        perm = jax.random.permutation(rng, pool_n)
        return perm[:per_step * nb].reshape(per_step, nb)
    keys = jax.random.split(rng, per_step)
    return jax.vmap(
        lambda k: jax.random.choice(k, pool_n, (nb,), replace=False))(keys)


def jit_train_step_device_data(cfg: Config, dsteps: int, gsteps: int,
                               mesh: Optional[Mesh] = None,
                               mode: str = "gspmd",
                               steps_per_dispatch: int = 1):
    """The train step over a DEVICE-RESIDENT dataset
    (``data_placement=device``): ``step(state, data) -> (state,
    metrics)`` where ``data`` is the whole uint8 dataset already on
    device (committed, NOT donated — it is reused every dispatch).
    Each macro-step gathers its (dsteps+gsteps, B) batch in-program by
    indices drawn from that step's ``state.rng`` (folded on a fixed
    tag, distinct from ``on_device_data``'s), so batches stay a pure
    function of the checkpointed RNG chain: exact resume holds and the
    stream is ``steps_per_dispatch``-invariant on every path (the fold
    happens INSIDE the scan body, per macro-step, on single-chip and
    mesh programs alike).

    vs the host pipeline: zero per-step host->device transfer.  That
    removes the tunneled link from the step wall-clock (BASELINE.md:
    the link, not the device, bounds host-fed steps here) and sidesteps
    the device client's per-transfer staging-buffer leak (~payload
    bytes retained per transfer; OOM-killed two 100k-step runs) —
    measured flat-RSS in /tmp/leak_probe runs.  The index stream is
    threefry-keyed on device, so it deliberately does NOT bit-match
    the host pipeline's numpy stream; both are deterministic.

    On a mesh, ``cfg.device_data_sharding`` picks the pool layout:

    * ``replicated`` (default) — every chip holds the whole pool; the
      gather is a plain GSPMD program and (at K=1) matches the
      single-device step bit-for-bit (tested).  Right for CIFAR-scale
      pools (~150 MB).
    * ``sharded`` — the pool is partitioned over the mesh's data axis
      (each chip holds pool/n samples; ImageNet64-scale pools ~15 GB
      fit across 8 chips where replication cannot).  Each shard draws
      its B/n batch rows from its OWN slice via a shard_map gather —
      indices never cross shards, so there is no collective in the
      data path; the global batch is the concatenation of per-shard
      draws, whose marginal is uniform over the whole pool (equal-size
      shards).  The index stream is per-shard (axis_index folded in),
      so this mode is NOT bit-comparable to the replicated one —
      deterministic and resume-exact all the same.
    """
    per_step = dsteps + gsteps
    nb = cfg.real_batch_size

    if mesh is not None and len(mesh.devices.flat) > 1:
        # base = ONE macro-step; K>1 scans (gather + macro-step) below
        # so the index fold uses each step's OWN state.rng — the data
        # stream is a pure function of (seed, step), K-invariant, same
        # as the single-chip path (it used to fold once per dispatch,
        # making the stream depend on dispatch-boundary layout)
        base = jit_train_step(cfg, dsteps, gsteps, mesh=mesh, mode=mode,
                              steps_per_dispatch=1)
        k = steps_per_dispatch

        if cfg.device_data_sharding == "sharded":
            from jax.experimental.shard_map import shard_map
            n = len(mesh.devices.flat)
            if nb % n:
                raise ValueError(
                    f"device_data_sharding=sharded needs real_batch_size "
                    f"divisible by the mesh ({nb} vs {n} shards)")
            nb_local = nb // n

            def local_gather(rng, pool_shard):
                r = jax.random.fold_in(
                    jax.random.fold_in(rng, 0x0DA7A0D1),
                    jax.lax.axis_index("data"))
                # without-replacement per local row; cross-shard
                # duplicates are impossible (disjoint pool partitions),
                # so the concatenated global batch is duplicate-free too
                idx = _batch_indices(r, pool_shard.shape[0], per_step,
                                     nb_local)
                return pool_shard[idx]

            gathered = shard_map(local_gather, mesh=mesh,
                                 in_specs=(P(), P("data")),
                                 out_specs=P(None, "data"))

            def gather_step(state: TrainState, data: Array):
                if data.shape[0] % n:
                    raise ValueError(
                        f"device_data_sharding=sharded needs the pool "
                        f"size divisible by the mesh ({data.shape[0]} "
                        f"samples vs {n} shards)")
                return base(state, gathered(state.rng, data))
        else:
            def gather_step(state: TrainState, data: Array):
                rng = jax.random.fold_in(state.rng, 0x0DA7A0D1)
                idx = _batch_indices(rng, data.shape[0], per_step, nb)
                return base(state, data[idx])

        def gather_multi(state: TrainState, data: Array):
            if k == 1:
                return gather_step(state, data)
            state, metrics = jax.lax.scan(
                lambda s, _: gather_step(s, data), state, None, length=k)
            return state, jax.tree.map(lambda x: x[-1], metrics)

        return jax.jit(gather_multi, donate_argnums=(0,))

    single = build_train_step(cfg, dsteps, gsteps)

    def data_step(state: TrainState, data: Array):
        rng = jax.random.fold_in(state.rng, 0x0DA7A0D1)
        idx = _batch_indices(rng, data.shape[0], per_step, nb)
        return single(state, data[idx])

    def multi(state: TrainState, data: Array):
        if steps_per_dispatch == 1:
            return data_step(state, data)
        state, metrics = jax.lax.scan(
            lambda s, _: data_step(s, data), state, None,
            length=steps_per_dispatch)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return jax.jit(multi, donate_argnums=(0,))


_SAMPLER_CACHE: Dict[Config, Callable] = {}
_SAMPLER_CACHE_MAX = 8    # bounded: a long sweep over many configs must
                          # not accumulate compiled executables forever


def _cached_gen_batch(cfg: Config) -> Callable:
    """Memoized jitted eval-mode generator apply (LRU, bounded) — a
    fresh jit per call would retrace and recompile at every scoring /
    visualization interval.  Used by ``interpolate`` (single batch, z
    supplied by the caller); ``sample`` uses the fused whole-request
    program below."""
    gen_batch = _SAMPLER_CACHE.pop(cfg, None)
    if gen_batch is not None:
        _SAMPLER_CACHE[cfg] = gen_batch          # re-insert: most recent
    if gen_batch is None:
        gen, _ = build_models(cfg)

        @jax.jit
        def gen_batch(g_params, g_batch_stats, z):
            return gen.apply({"params": g_params,
                              "batch_stats": g_batch_stats}, z, train=False)

        _SAMPLER_CACHE[cfg] = gen_batch
        while len(_SAMPLER_CACHE) > _SAMPLER_CACHE_MAX:
            _SAMPLER_CACHE.pop(next(iter(_SAMPLER_CACHE)))
    return gen_batch


_SAMPLE_PROG_CACHE: Dict[tuple, Callable] = {}


def _cached_sample_program(cfg: Config, n: int) -> Callable:
    """Memoized jitted whole-request sampler: z generation + eval-mode
    generator apply for ALL chunks of an n-image request fused into ONE
    XLA program (lax.scan over batch-sized chunks, slice to n inside).
    The earlier Python-loop form paid two dispatch latencies per chunk
    plus a trailing concatenate, which on the tunneled platform measured
    26.9k img/s vs 34.1k through the exported single-program serving
    artifact at B=512 (BASELINE.md) — the gap was dispatch, not math.
    Key sequence matches the loop form exactly (sequential
    ``rng, zk = split(rng)`` per chunk), so outputs are unchanged."""
    key = (cfg, n)
    prog = _SAMPLE_PROG_CACHE.pop(key, None)
    if prog is not None:
        _SAMPLE_PROG_CACHE[key] = prog           # re-insert: most recent
        return prog
    gen, _ = build_models(cfg)
    bs = cfg.batch_size
    chunks = -(-n // bs)

    @jax.jit
    def prog(g_params, g_batch_stats, rng):
        def one_chunk(r, _):
            r, zk = jax.random.split(r)
            z = jax.random.uniform(zk, (bs, cfg.z_dim),
                                   minval=-1.0, maxval=1.0)
            img = gen.apply({"params": g_params, "batch_stats":
                             g_batch_stats}, z, train=False)
            return r, img

        if chunks == 1:
            _, img = one_chunk(rng, None)
            return img[:n]
        _, imgs = jax.lax.scan(one_chunk, rng, None, length=chunks)
        return imgs.reshape((chunks * bs,) + imgs.shape[2:])[:n]

    _SAMPLE_PROG_CACHE[key] = prog
    while len(_SAMPLE_PROG_CACHE) > _SAMPLER_CACHE_MAX:
        _SAMPLE_PROG_CACHE.pop(next(iter(_SAMPLE_PROG_CACHE)))
    return prog


def eval_g_params(state: TrainState):
    """Generator params for eval-mode generation (scoring, sample grids,
    serving export): the EMA shadow when one is tracked (cfg.ema_decay >
    0), else the live params."""
    return state.g_params if state.g_params_ema is None else state.g_params_ema


def eval_g_stats(state: TrainState):
    """BN batch_stats matching ``eval_g_params``: the stats shadow when
    one is tracked, else the live running averages.  The shadow pair
    evolves under the same recurrence, so the weights and normalizer
    statistics served together are always of the same epoch — pairing
    the lagged weight shadow with live stats degenerated at 160px (see
    TrainState.g_stats_ema)."""
    return (state.g_batch_stats if state.g_stats_ema is None
            else state.g_stats_ema)


def sample(cfg: Config, state: TrainState, rng: jax.Array, n: int,
           use_ema: bool = True) -> Array:
    """Generate n images (eval mode: running BN averages; EMA weights +
    EMA stats when tracked unless ``use_ema=False``)."""
    prog = _cached_sample_program(cfg, n)
    if use_ema:
        params, stats = eval_g_params(state), eval_g_stats(state)
    else:
        params, stats = state.g_params, state.g_batch_stats
    return prog(params, stats, rng)


def interpolate(cfg: Config, state: TrainState, rng: jax.Array,
                rows: int = 8, cols: int = 8, use_ema: bool = True) -> Array:
    """Latent interpolation grid (the reference lineage's visualize
    option): each row is a linear walk in z between two random
    endpoints, decoded in eval mode (through the same memoized jitted
    apply as ``sample`` — per-call unjitted applies were the one
    device-touching path that skipped jit).  EMA weights when tracked
    unless ``use_ema=False`` (same escape hatch as ``sample``).
    Returns (rows*cols, ...)."""
    gen_batch = _cached_gen_batch(cfg)
    k0, k1 = jax.random.split(rng)
    z0 = jax.random.uniform(k0, (rows, cfg.z_dim), minval=-1.0, maxval=1.0)
    z1 = jax.random.uniform(k1, (rows, cfg.z_dim), minval=-1.0, maxval=1.0)
    t = jnp.linspace(0.0, 1.0, cols)[None, :, None]       # (1, cols, 1)
    z = z0[:, None, :] * (1.0 - t) + z1[:, None, :] * t   # (rows, cols, z)
    z = z.reshape(rows * cols, cfg.z_dim)
    if use_ema:
        params, stats = eval_g_params(state), eval_g_stats(state)
    else:
        params, stats = state.g_params, state.g_batch_stats
    return gen_batch(params, stats, z)
