"""Loss dispatch: mmd | tmmd | smmd | sn-smmd | wgan-gp.

Covers SURVEY.md components #4 (SMMD scaling) and #5 (witness gradient
penalty & WGAN-GP), plus the loss-dispatch half of component #2
(``set_loss`` in the reference's core/model.py).

Design notes (TPU-first, not a port):

* Losses are pure functions of a *critic closure* ``critic(x) ->
  (B, dof_dim) features`` — parameters, spectral-norm state and
  sharding all live in the closure built by ``smmdax.train``.  The
  same functions therefore serve single-chip and shard_map'd
  data-parallel steps (where ``critic`` internally all-gathers
  features for the global-batch estimator).
* Everything here is twice-differentiable: the witness penalty and
  the SMMD normalizer differentiate through ``jax.grad`` of the conv
  stack, and the d-step then differentiates *that* w.r.t. critic
  params (double backprop, SURVEY.md §7 hard-part #1).  No custom_vjp
  is needed — XLA handles the second-order graph.
* Sign convention: both returned losses are MINIMIZED.  The critic
  maximizes its objective, so ``d_loss`` is its negation plus
  penalties.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from smmdax.configs import Config
from smmdax.kernels import (KernelBlocks, kernel_cross, kernel_matrices,
                            mmd2, mmd2_and_ratio)
from smmdax.kernels.smmd import smmd_scale
from smmdax.parallel.ring import RING_KERNELS

Array = jnp.ndarray
Critic = Callable[[Array], Array]          # images -> (B, dof_dim) features


class LossAux(NamedTuple):
    """Diagnostics reported every step (reference: TB summaries)."""

    mmd2: Array
    sigma: Array          # SMMD normalizer (1.0 when scaling off)
    gp: Array             # gradient penalty value (0.0 when off)
    ratio: Array          # tmmd ratio (mmd2 when not tmmd)
    critic_real: Array    # mean scalar critic on real (wgan diagnostics)
    critic_fake: Array


def _blocks(cfg: Config, f_fake: Array, f_real: Array) -> KernelBlocks:
    return kernel_matrices(cfg.kernel, f_fake, f_real,
                           rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                           add_dot=cfg.kernel_add_dot)


def _kernel_params(cfg: Config):
    return cfg.rbf_sigmas if cfg.kernel == "gaussian" else cfg.rq_alphas


def _add_dot(cfg: Config) -> float:
    """Effective mix_rq_dot weight: rq only, mirroring
    kernels.kernel_matrices (other kernels ignore the flag)."""
    return cfg.kernel_add_dot if cfg.kernel == "rq" else 0.0


def _pallas(cfg: Config, f_a: Array, f_b: Array,
            axis_name: Optional[str]) -> bool:
    """Static (trace-time) fused-vs-dense decision for the Gram blocks
    these two feature matrices will produce (on/off/auto dispatch —
    crossover measured in BASELINE.md).

    Multi-shard programs WITHOUT an explicit mesh axis (i.e. GSPMD
    partitioning) never dispatch: a pallas_call is opaque to the XLA
    partitioner (it would run replicated on gathered operands,
    defeating the sharding).  The fused path belongs to single-chip jit
    and to shard_map bodies (axis_name set), where it runs per shard
    with explicit collectives around it.  Keyed on the actual execution
    context, not cfg.dp_mode — jit_train_step's mode argument can
    differ from the config.
    """
    if axis_name is None and cfg.num_data_shards > 1:
        return False
    from smmdax.pallas.dispatch import should_use_pallas
    return should_use_pallas(cfg.use_pallas, cfg.kernel,
                             f_a.shape[0], f_b.shape[0],
                             min_rows=cfg.pallas_min_rows)


def _ring_eligible(cfg: Config, axis_name: Optional[str]) -> bool:
    """The ring estimators serve EVERY loss-surface kernel inside
    shard_map bodies — the mixtures, the rq+add_dot (mix_rq_dot)
    variant, and the pure dot kernel; data-dependent diagonals are
    handled explicitly (smmdax.parallel.ring docs)."""
    return (axis_name is not None and cfg.use_ring_mmd
            and cfg.kernel in RING_KERNELS)


def _critic_features(cfg: Config, critic: Critic,
                     real: Array, fake: Array) -> Tuple[Array, Array]:
    """critic(real), critic(fake) — as ONE application on the
    concatenated batch when shapes allow (cfg.fuse_critic_batches).

    Convs/SN-dense are per-sample maps (no BatchNorm in the critic), so
    the fused application is semantically identical while doubling the
    conv batch.  Measured round 2 (BASELINE.md): a wash at 32px B=64 on
    this link (the step is transfer/dispatch-bound there), so the flag
    defaults off; kept because larger images or real PCIe/DMA hosts
    shift the balance toward fewer, bigger conv stacks.
    """
    if cfg.fuse_critic_batches and real.shape[1:] == fake.shape[1:]:
        f = critic(jnp.concatenate([real, fake], axis=0))
        return f[:real.shape[0]], f[real.shape[0]:]
    return critic(real), critic(fake)


def _gather(f: Array, axis_name: Optional[str]) -> Array:
    """Local (b, d) feature shard -> global (B_g, d) on every shard."""
    if axis_name is None:
        return f
    return jax.lax.all_gather(f, axis_name, axis=0, tiled=True)


def _pmean(v: Array, axis_name: Optional[str]) -> Array:
    return v if axis_name is None else jax.lax.pmean(v, axis_name)


def mmd2_objective(cfg: Config, f_fake: Array, f_real: Array,
                   axis_name: Optional[str] = None) -> Array:
    """Global-batch MMD^2 with the configured execution path:

    * ``use_ring_mmd`` (+ axis_name): block-row ring over ICI — local
      feature shards in, global estimator out, O(B_g^2/N) peak memory.
    * ``use_pallas``: the fused Pallas Gram+reduce kernel (global or
      gathered features).
    * otherwise: dense jnp Gram blocks (the oracle path).
    All three are numerically the same estimator (property-tested).
    """
    if axis_name is not None and not cfg.global_batch_mmd:
        # per-shard local-batch estimator, averaged across shards (the
        # cheap non-global variant; the [SPEC] default is global)
        if _pallas(cfg, f_fake, f_real, axis_name):
            from smmdax.pallas import fused_mmd2
            local = fused_mmd2(f_fake, f_real, cfg.kernel, _kernel_params(cfg),
                               add_dot=_add_dot(cfg))
        else:
            local = mmd2(_blocks(cfg, f_fake, f_real))
        return jax.lax.pmean(local, axis_name)
    if _ring_eligible(cfg, axis_name):
        from smmdax.parallel.ring import ring_mmd2
        # the ring's pair sums see (local_b, local_b) blocks
        return ring_mmd2(f_fake, f_real, axis_name, cfg.kernel,
                         rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                         use_pallas=_pallas(cfg, f_fake, f_real, axis_name),
                         add_dot=_add_dot(cfg))
    f_fake = _gather(f_fake, axis_name)
    f_real = _gather(f_real, axis_name)
    if _pallas(cfg, f_fake, f_real, axis_name):
        from smmdax.pallas import fused_mmd2
        return fused_mmd2(f_fake, f_real, cfg.kernel, _kernel_params(cfg),
                          add_dot=_add_dot(cfg))
    return mmd2(_blocks(cfg, f_fake, f_real))


def _scalar_critic(features: Array) -> Array:
    """WGAN view of the critic: sum of the feature head (== the scalar
    output when dof_dim = 1, the reference's wgan configuration)."""
    return jnp.sum(features, axis=-1)


# ---------------------------------------------------------------------------
# SMMD normalizer


def sobolev_scale(cfg: Config, critic: Critic, real: Array,
                  rng: Optional[jax.Array] = None) -> Array:
    """sigma_{k,lambda} = lambda + E_real ||J_phi(x)||_F^2 (+ E||phi||^2).

    Estimator selected by ``cfg.scaling_grad_estimator``
    (SURVEY.md component #4):

    * ``exact`` — full Frobenius norm via ``jacrev`` (dof_dim
      cotangents, vectorized; paper-exact, the default and the test
      oracle for the others).
    * ``sum`` — ||d(sum_d phi_d)/dx||^2 in one backward pass: the
      analog of TF1's ``tf.gradients`` on a vector output (which
      differentiates the SUM of outputs), i.e. what the reference's
      graph actually computes [R-MED, unverifiable offline].  A lower
      bound on the Frobenius norm; ~dof_dim x cheaper.
    * ``hutchinson`` — unbiased ||J||_F^2 via one Rademacher probe v:
      E_v ||d(phi.v)/dx||^2 = ||J||_F^2; one backward pass per step.

    Data-parallel semantics: under shard_map the rng is shard-folded
    (train._shard_rng), so with ``hutchinson`` each shard draws its OWN
    probe and sigma is the pmean of per-shard estimates — still an
    unbiased estimate of the global ||J||_F^2 (with N independent
    probes, LOWER variance than one shared probe), but not bit-equal to
    the single-device draw.  Exact shard_map-vs-single-device sigma
    parity therefore holds for ``exact`` (and ``sum``) only; the
    hutchinson DP semantics are pinned by
    tests/test_shardmap_mode.py::test_hutchinson_sigma_unbiased_under_dp.
    """
    est = cfg.scaling_grad_estimator

    if est == "exact":
        def phi_single(x: Array) -> Array:
            return critic(x[None])[0]                  # (dof_dim,)

        jac = jax.vmap(jax.jacrev(phi_single))(real)   # (B, dof, H, W, C)
        grad_sq = jnp.sum(jac * jac, axis=tuple(range(1, jac.ndim)))
    else:
        if est == "hutchinson":
            if rng is None:
                raise ValueError("hutchinson estimator needs an rng")
            probe = jax.random.rademacher(
                rng, (critic(real[:1]).shape[-1],), dtype=jnp.float32)
        else:
            probe = None

        def scalar_out(x: Array) -> Array:
            f = critic(x)
            return jnp.sum(f if probe is None else f * probe)

        grads = jax.grad(scalar_out)(real)             # (B, H, W, C)
        grad_sq = jnp.sum(grads * grads, axis=tuple(range(1, grads.ndim)))

    value_sq = None
    if cfg.scaling_variant == "value_and_grad":
        feats = critic(real)
        value_sq = jnp.sum(feats * feats, axis=-1)
    return smmd_scale(grad_sq, value_sq, cfg.scaling_coeff, cfg.scaling_variant)


# ---------------------------------------------------------------------------
# Gradient penalties


def _grad_norms(f: Callable[[Array], Array], x: Array) -> Array:
    """Per-sample L2 norms of d f_i / d x_i for a batchwise-diagonal f."""
    grads = jax.grad(lambda v: jnp.sum(f(v)))(x)       # (B, ...)
    return jnp.sqrt(jnp.sum(grads * grads, axis=tuple(range(1, grads.ndim))) + 1e-12)


def _penalize(norms: Array, variant: str) -> Array:
    if variant == "one_sided":
        return jnp.mean(jnp.square(jnp.maximum(norms - 1.0, 0.0)))
    return jnp.mean(jnp.square(norms - 1.0))


def witness_gradient_penalty(cfg: Config, critic: Critic,
                             real: Array, fake: Array,
                             f_real: Array, f_fake: Array,
                             rng: jax.Array) -> Array:
    """MMD-witness analog of WGAN-GP (Demystifying MMD GANs; SURVEY #5).

    w(x') = E_fake k(phi(x'), phi(fake)) - E_real k(phi(x'), phi(real)),
    penalized at per-sample interpolates x' = eps*real + (1-eps)*fake.
    """
    b = min(real.shape[0], fake.shape[0])
    eps = jax.random.uniform(rng, (b,) + (1,) * (real.ndim - 1))
    xhat = eps * real[:b] + (1.0 - eps) * fake[:b]
    if cfg.gp_detach_sets:
        # perf approximation (see Config.gp_detach_sets): the penalty's
        # second-order term w.r.t. critic params then flows only through
        # phi(xhat), like WGAN-GP — 4x cheaper, slightly different
        # regularizer
        f_real = jax.lax.stop_gradient(f_real)
        f_fake = jax.lax.stop_gradient(f_fake)

    def witness(x: Array) -> Array:
        fx = critic(x)                                   # (b, dof)
        k_fake = kernel_cross(cfg.kernel, fx, f_fake,
                              rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                              add_dot=cfg.kernel_add_dot)
        k_real = kernel_cross(cfg.kernel, fx, f_real,
                              rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                              add_dot=cfg.kernel_add_dot)
        return jnp.mean(k_fake, axis=1) - jnp.mean(k_real, axis=1)   # (b,)

    return _penalize(_grad_norms(witness, xhat), cfg.gp_variant)


def wgan_gradient_penalty(cfg: Config, critic: Critic,
                          real: Array, fake: Array, rng: jax.Array) -> Array:
    b = min(real.shape[0], fake.shape[0])
    eps = jax.random.uniform(rng, (b,) + (1,) * (real.ndim - 1))
    xhat = eps * real[:b] + (1.0 - eps) * fake[:b]
    norms = _grad_norms(lambda x: _scalar_critic(critic(x)), xhat)
    return _penalize(norms, cfg.gp_variant)


# ---------------------------------------------------------------------------
# Critic / generator losses


def critic_loss(cfg: Config, critic: Critic, real: Array, fake: Array,
                rng: jax.Array,
                axis_name: Optional[str] = None) -> Tuple[Array, LossAux]:
    """The d-step objective (minimized).  SURVEY.md call stack §3.2.

    With ``axis_name`` (inside shard_map) ``real``/``fake`` are LOCAL
    shards; every statistic is computed over the GLOBAL batch (gather /
    ring for the kernel terms, pmean for per-sample means) so the loss
    value — and therefore pmean'd gradients — match the single-device
    global-batch computation.
    """
    f_real, f_fake = _critic_features(cfg, critic, real, fake)

    if cfg.model == "wgan-gp":
        h_real = _pmean(jnp.mean(_scalar_critic(f_real)), axis_name)
        h_fake = _pmean(jnp.mean(_scalar_critic(f_fake)), axis_name)
        loss = h_fake - h_real
        gp = _pmean(wgan_gradient_penalty(cfg, critic, real, fake, rng),
                    axis_name)
        loss = loss + cfg.gradient_penalty * gp
        if cfg.L2_discriminator_penalty > 0:
            loss = loss + cfg.L2_discriminator_penalty * 0.5 * _pmean(
                jnp.mean(f_real**2) + jnp.mean(f_fake**2), axis_name)
        aux = LossAux(mmd2=jnp.float32(0), sigma=jnp.float32(1), gp=gp,
                      ratio=jnp.float32(0),
                      critic_real=h_real, critic_fake=h_fake)
        return loss, aux

    if cfg.model == "tmmd":
        if _ring_eligible(cfg, axis_name):
            # ring-form variance estimator: the Sutherland formula is
            # all row-sums / squared sums, psum-able over block rows —
            # no dense global Gram needed (SURVEY.md §7 hard-part #3)
            from smmdax.parallel.ring import ring_mmd2_and_ratio
            mmd2_val, objective = ring_mmd2_and_ratio(
                f_fake, f_real, axis_name, cfg.kernel,
                rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                use_pallas=_pallas(cfg, f_fake, f_real, axis_name),
                add_dot=_add_dot(cfg))
        else:
            # dense path: the variance estimator over full Gram blocks
            blocks = _blocks(cfg, _gather(f_fake, axis_name),
                             _gather(f_real, axis_name))
            mmd2_val, objective = mmd2_and_ratio(blocks)
    else:
        mmd2_val = mmd2_objective(cfg, f_fake, f_real, axis_name)
        objective = mmd2_val

    sigma = jnp.float32(1.0)
    if cfg.with_scaling:
        rng, rng_scale = jax.random.split(rng)
        sigma = _pmean(sobolev_scale(cfg, critic, real, rng_scale), axis_name)
        objective = objective / sigma

    loss = -objective
    gp = jnp.float32(0.0)
    if cfg.gradient_penalty > 0:
        gp = _pmean(witness_gradient_penalty(
            cfg, critic, real, fake,
            _gather(f_real, axis_name), _gather(f_fake, axis_name), rng),
            axis_name)
        loss = loss + cfg.gradient_penalty * gp
    if cfg.L2_discriminator_penalty > 0:
        loss = loss + cfg.L2_discriminator_penalty * 0.5 * _pmean(
            jnp.mean(f_real**2) + jnp.mean(f_fake**2), axis_name)

    aux = LossAux(mmd2=mmd2_val, sigma=sigma, gp=gp,
                  ratio=objective,
                  critic_real=_pmean(jnp.mean(_scalar_critic(f_real)), axis_name),
                  critic_fake=_pmean(jnp.mean(_scalar_critic(f_fake)), axis_name))
    return loss, aux


def generator_loss(cfg: Config, critic: Critic, real: Array, fake: Array,
                   scale_g_loss: bool = True,
                   axis_name: Optional[str] = None,
                   rng: Optional[jax.Array] = None) -> Tuple[Array, LossAux]:
    """The g-step objective (minimized).

    For MMD losses G minimizes the (optionally scaled) MMD^2; the
    normalizer sigma depends only on real data and critic params, so
    for G it is a positive constant — we still apply it so the
    effective generator step size matches the scaled objective.
    """
    f_real, f_fake = _critic_features(cfg, critic, real, fake)

    if cfg.model == "wgan-gp":
        h_real = _pmean(jnp.mean(_scalar_critic(f_real)), axis_name)
        h_fake = _pmean(jnp.mean(_scalar_critic(f_fake)), axis_name)
        loss = -h_fake
        aux = LossAux(mmd2=jnp.float32(0), sigma=jnp.float32(1),
                      gp=jnp.float32(0), ratio=jnp.float32(0),
                      critic_real=h_real, critic_fake=h_fake)
        return loss, aux

    mmd2_val = mmd2_objective(cfg, f_fake, f_real, axis_name)
    loss = mmd2_val
    sigma = jnp.float32(1.0)
    if cfg.with_scaling and scale_g_loss:
        # sigma is stop-gradient'd (a pure step-size rescale for G) but
        # still recomputed with the configured estimator so the g-step
        # objective value matches the critic's scaled objective exactly
        # — with estimator='exact' this costs dof_dim backward passes
        # per g-step; the production config uses the one-backward
        # hutchinson estimator, where the cost is negligible
        sigma = jax.lax.stop_gradient(
            _pmean(sobolev_scale(cfg, critic, real, rng), axis_name))
        loss = loss / sigma
    aux = LossAux(mmd2=mmd2_val, sigma=sigma, gp=jnp.float32(0),
                  ratio=mmd2_val,
                  critic_real=_pmean(jnp.mean(_scalar_critic(f_real)), axis_name),
                  critic_fake=_pmean(jnp.mean(_scalar_critic(f_fake)), axis_name))
    return loss, aux
