"""Configuration for smmdax.

The field names deliberately mirror the reference CLI flag set
(SURVEY.md section 2, component #1: the ``tf.app.flags`` definitions of
the reference ``main.py`` — dataset, architecture, kernel, model,
batch_size, real_batch_size, output_size, c_dim, z_dim, gf_dim, df_dim,
dof_dim, learning_rate, beta1, beta2, dsteps, gsteps, start_dsteps,
gradient_penalty, L2_discriminator_penalty, with_scaling, scaling_coeff,
scaling_variant, with_sn, max_iteration, MMD_lr_scheduler, decay_rate,
compute_scores, no_of_samples, is_train, visualize, log, data_dir,
checkpoint_dir, sample_dir, log_dir, random_seed, suffix) so a user of
the reference can switch over without relearning the surface.

Unlike the reference (a TF1 flags blob mutated at import time) this is a
frozen dataclass: configs are values, pass them around, jit over them as
static arguments.

Intentionally omitted reference flags: ``gpu_mem`` (a TF1
per-process-GPU-memory-fraction session knob — XLA/TPU memory is
compiler-managed) and TF1 queue sizing knobs (the input pipeline is
stateless, see smmdax.data).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

# Kernel mixture constants of the reference lineage (SURVEY.md #3):
# gaussian/RBF bandwidths and rational-quadratic alphas.
DEFAULT_RBF_SIGMAS: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0, 16.0)
DEFAULT_RQ_ALPHAS: Tuple[float, ...] = (0.2, 0.5, 1.0, 2.0, 5.0)

LOSSES = ("mmd", "tmmd", "smmd", "sn-smmd", "wgan-gp")
KERNELS = ("gaussian", "rq", "dot", "distance")
ARCHS = ("dcgan", "resnet", "mlp")
DATASETS = ("cifar10", "celeba", "imagenet64", "lsun", "mnist",
            "gaussian_mix", "synthetic")
SCALING_VARIANTS = ("grad", "value_and_grad")
GRAD_ESTIMATORS = ("exact", "sum", "hutchinson")
GP_VARIANTS = ("one_sided", "two_sided")


@dataclass(frozen=True)
class Config:
    # --- model selection -------------------------------------------------
    model: str = "mmd"              # loss family: mmd|tmmd|smmd|sn-smmd|wgan-gp
    kernel: str = "rq"              # gaussian|rq|dot|distance
    architecture: str = "dcgan"     # dcgan|resnet
    dataset: str = "cifar10"

    # --- shapes -----------------------------------------------------------
    batch_size: int = 64            # generated (fake) GLOBAL batch per update
    real_batch_size: int = 64       # real GLOBAL batch per update
    output_size: int = 32           # image H=W
    c_dim: int = 3                  # image channels
    z_dim: int = 128                # latent dim
    gf_dim: int = 64                # generator base width
    df_dim: int = 64                # critic base width
    dof_dim: int = 16               # critic output feature dim (MMD acts on this)

    # --- optimization -----------------------------------------------------
    learning_rate: float = 1e-4
    g_learning_rate: Optional[float] = None   # default: learning_rate
    d_learning_rate: Optional[float] = None   # default: learning_rate
    beta1: float = 0.5
    beta2: float = 0.9
    dsteps: int = 5                 # critic updates per generator update
    gsteps: int = 1
    start_dsteps: int = 10          # extra critic warm-up updates for early steps
    warmup_iterations: int = 500    # steps using start_dsteps instead of dsteps
    max_iteration: int = 150_000
    ema_decay: float = 0.0          # generator weight EMA (0 = off).  When
                                    # >0 a shadow copy of g_params is kept,
                                    # updated e <- d*e + (1-d)*p after every
                                    # generator update, and USED for all
                                    # eval-mode generation (scoring, sample
                                    # grids, CLI sampling, serving export) —
                                    # the standard GAN serving discipline;
                                    # beyond-reference capability.
    ema_eval_compare: bool = False  # with ema_decay > 0: every scoring
                                    # event ALSO scores the live weights
                                    # (fid_live/kid_live alongside the EMA
                                    # fid/kid).  Training is identical with
                                    # EMA on/off (the shadow is passive), so
                                    # one run yields a PAIRED live-vs-EMA
                                    # quality comparison — no second run, no
                                    # seed noise.  Costs one extra sample+
                                    # extract sweep per event; off by default.

    # --- regularizers -----------------------------------------------------
    gradient_penalty: float = 0.0        # witness-gradient / WGAN-GP weight
    gp_variant: str = "one_sided"        # one_sided | two_sided
    gp_detach_sets: bool = False         # stop-gradient the witness comparison
                                         # sets inside the penalty: 4x faster
                                         # d-step (52 vs 206 ms measured), an
                                         # approximation of the TF1 semantics
                                         # where grads flow through everything
    L2_discriminator_penalty: float = 0.0
    with_scaling: bool = False           # scaled-MMD normalizer (set by model=smmd)
    scaling_coeff: float = 10.0          # lambda in sigma = lambda + E||dD/dx||^2
    scaling_variant: str = "grad"        # grad | value_and_grad
    # Jacobian-norm estimator for sigma:
    #   exact      - full ||J||_F^2 via jacrev (dof_dim cotangents; paper-exact)
    #   sum        - ||grad of summed features||^2 (one backward; the
    #                tf.gradients-of-a-vector analog of the TF1 lineage)
    #   hutchinson - unbiased ||J||_F^2 via one Rademacher probe
    scaling_grad_estimator: str = "exact"
    with_sn: bool = False                # spectral norm on critic (set by sn-smmd)
    sn_iters: int = 1                    # power-iteration steps per update

    # --- kernel mixture constants ------------------------------------------
    rbf_sigmas: Tuple[float, ...] = DEFAULT_RBF_SIGMAS
    rq_alphas: Tuple[float, ...] = DEFAULT_RQ_ALPHAS
    kernel_add_dot: float = 0.0          # rq only: add w*<x,y> to the mixture
                                         # (the lineage's mix_rq_dot variant —
                                         # keeps the critic from collapsing
                                         # feature scale); non-constant
                                         # diagonal, so ring/Pallas paths
                                         # stay dense when set

    # --- LR scheduling (KID-driven three-sample test, SURVEY.md #11) -------
    MMD_lr_scheduler: bool = True
    three_sample_test: str = "pvalue"    # scheduler decision rule:
                                         #   pvalue - Bounliphone et al.
                                         #     relative-MMD hypothesis test
                                         #     (asymptotic p-value with the
                                         #     shared-sample cross-covariance;
                                         #     the lineage's mechanism)
                                         #   vote - subset-vote heuristic
                                         #     (fraction of subset draws where
                                         #     current beats best)
    scheduler_p_threshold: float = 0.1   # pvalue arm: decay unless the test
                                         # rejects "no improvement" at this
                                         # level
    scheduler_test_size: int = 5000      # pvalue arm: sample size m of the
                                         # hypothesis test (clamped to the
                                         # available features).  The default
                                         # is ONE test at large m — the
                                         # p-value is then exactly calibrated
                                         # (H0 rejection rate == threshold;
                                         # pinned by the calibration test) —
                                         # and m=5000 costs ~nothing on the
                                         # device scoring path
    scheduler_test_subsets: int = 1      # >1: Fisher-combined subset tests
                                         # (anti-conservative under subset
                                         # overlap; see scores.fisher_combine)
    scheduler_patience: int = 3          # consecutive failed three-sample
                                         # tests before the LR decays (the
                                         # lineage's protocol decays after
                                         # ~3 consecutive no-improvement
                                         # verdicts [R-MED]; 1 = decay
                                         # immediately).  The counter lives
                                         # in TrainState, so resume keeps
                                         # scheduler decisions exact.  A
                                         # live run without patience showed
                                         # why it exists: every quality
                                         # plateau compounds decay (19x in
                                         # 48k steps -> LR frozen)
    decay_rate: float = 0.8
    lr_decay_steps: int = 0              # optional fixed exponential decay interval
    reload_best_on_decay: bool = False   # on a failed three-sample test, also
                                         # reload the best-so-far checkpoint's
                                         # model state (reference's alternative
                                         # scheduler arm, SURVEY.md §2.11 [R-MED])

    # --- eval / scoring -----------------------------------------------------
    compute_scores: bool = False
    score_every: int = 2000
    no_of_samples: int = 25_000
    score_subset_size: int = 1000        # KID block size
    score_subsets: int = 50              # KID number of subsets

    # --- parallelism (new capability; reference was single-GPU) ------------
    num_data_shards: int = 1             # data-parallel mesh size (1 = single chip)
    dp_mode: str = "gspmd"               # gspmd | shard_map (explicit collectives)
    global_batch_mmd: bool = True        # MMD over the global batch (all-gather feats)
    use_ring_mmd: bool = False           # block-row ring estimator over ICI
                                         # (effective in shard_map mode; implies it)
    use_pallas: str = "auto"             # Pallas fused kernel+MMD hot path:
                                         # on | off | auto (auto = fused path
                                         # when the Gram rows a pair-sum sees
                                         # reach pallas_min_rows on TPU —
                                         # measured crossover, BASELINE.md;
                                         # bools accepted and normalized)
    pallas_min_rows: int = 4096          # auto-dispatch crossover (rows)
    fuse_critic_batches: bool = False    # apply the critic ONCE on
                                         # concat(real, fake) per loss.
                                         # Semantically exact (per-sample
                                         # convs, no BN in the critic) but
                                         # measured a wash on this link
                                         # (BASELINE.md round 2), so off by
                                         # default; may win on larger
                                         # images / non-tunneled hardware
    steps_per_dispatch: int = 1          # macro-steps fused into ONE jitted
                                         # dispatch (lax.scan) and ONE
                                         # host->device batch transfer.
                                         # Amortizes per-step dispatch +
                                         # transfer latency (the dominant
                                         # non-device cost on tunneled/PCIe
                                         # links — BASELINE.md r2 roofline:
                                         # 21 ms device vs 36-56 ms wall).
                                         # Math is unchanged: batches are a
                                         # pure function of (seed, step) and
                                         # the scan chains the same per-step
                                         # programs, so K>1 is bit-identical
                                         # to K=1 (tested).  The trainer
                                         # clips each dispatch at event
                                         # boundaries (log/sample/ckpt/score)
                                         # so cadences are unaffected.
    compute_dtype: str = "float32"       # bfloat16 for MXU-heavy conv paths
    remat: bool = False                  # rematerialize critic forwards in
                                         # backward passes (HBM for FLOPs —
                                         # needed for 160px double-backprop)
    uint8_transfer: bool = True          # ship real batches to the device as
                                         # uint8 and normalize on-device
    on_device_data: bool = False         # synthesize real batches IN-PROGRAM
                                         # from the state RNG: zero host
                                         # transfer.  Link-independent
                                         # MEASUREMENT / hostless-smoke mode
                                         # (draws uniform noise — NOT the
                                         # SyntheticImages distribution, so
                                         # compute_scores is rejected with
                                         # it); deterministic, exact-resume,
                                         # and steps_per_dispatch-invariant
                                         # since each macro-step's batch is a
                                         # pure function of the checkpointed
                                         # RNG chain (tested)

    data_placement: str = "host"         # "device": upload the WHOLE dataset
                                         # to HBM once and gather each batch
                                         # IN-PROGRAM from the RNG chain —
                                         # zero per-step host->device
                                         # transfer.  Motivated by a measured
                                         # ~1.2 MB/step host RSS leak in the
                                         # tunneled device client (one
                                         # staging buffer retained per
                                         # transfer, BASELINE.md r3 row) that
                                         # OOM-killed two >100k-step runs —
                                         # and it removes the link from the
                                         # step entirely (it was the wall-
                                         # clock bottleneck).  Unlike
                                         # on_device_data this trains on the
                                         # REAL dataset, so scoring works.
                                         # Batches remain a pure function of
                                         # the checkpointed RNG chain
                                         # (exact-resume + K-invariance
                                         # tested); the index stream is
                                         # device-keyed, so it differs from
                                         # the host pipeline's numpy stream.
    device_data_pool: int = 50000        # for procedural sources (synthetic)
                                         # under data_placement=device: size
                                         # of the fixed "training set" pool
                                         # drawn once at startup
    device_data_sharding: str = "replicated"  # on a mesh: "replicated"
                                         # (every chip holds the whole pool;
                                         # bit-matches single-device at K=1)
                                         # or "sharded" (pool partitioned
                                         # over the data axis, each shard
                                         # gathers its B/n rows from its own
                                         # slice — ImageNet64-scale pools
                                         # ~15 GB fit across chips where
                                         # replication cannot)
    rss_limit_gb: float = 0.0            # >0: if host RSS exceeds this at a
                                         # log boundary, checkpoint and exit
                                         # cleanly (the leak above makes
                                         # host-fed runs creep; this turns
                                         # an eventual OOM kill into a
                                         # graceful preemption)
    auto_restart: bool = False           # with rss_limit_gb: re-exec the
                                         # process after the watchdog
                                         # checkpoint — the fresh process
                                         # auto-resumes, so long host-fed
                                         # runs self-heal instead of dying

    # --- observability (SURVEY.md §5: tracing/profiling + numerics
    #     harness, the TPU analogs of TensorBoard + tf.check_numerics) ---
    debug_nans: bool = False         # enable jax NaN checks (slow; debugging)
    profile_steps: int = 0           # trace steps [start, start+5) with
    profile_start: int = 10          #   jax.profiler into log_dir/profile
    tensorboard: bool = False        # also write tf.summary event files

    # --- bookkeeping --------------------------------------------------------
    is_train: bool = True
    visualize: bool = False
    log: bool = True
    log_every: int = 100
    sample_every: int = 1000
    checkpoint_every: int = 2000
    data_dir: str = "./data"
    lsun_category: str = ""         # LSUN scene/environment to train on
                                    # (e.g. "bedroom_train"); empty = the
                                    # single environment present, with an
                                    # error if several are (the reference
                                    # exposes the scene choice too)
    checkpoint_dir: str = "./checkpoints"
    sample_dir: str = "./samples"
    log_dir: str = "./logs"
    random_seed: int = 42
    suffix: str = ""

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.model not in LOSSES:
            raise ValueError(f"model must be one of {LOSSES}, got {self.model!r}")
        if self.kernel not in KERNELS:
            raise ValueError(f"kernel must be one of {KERNELS}, got {self.kernel!r}")
        if self.architecture not in ARCHS:
            raise ValueError(f"architecture must be one of {ARCHS}")
        if self.scaling_variant not in SCALING_VARIANTS:
            raise ValueError(f"scaling_variant must be one of {SCALING_VARIANTS}")
        if self.gp_variant not in GP_VARIANTS:
            raise ValueError(f"gp_variant must be one of {GP_VARIANTS}")
        if self.scaling_grad_estimator not in GRAD_ESTIMATORS:
            raise ValueError(
                f"scaling_grad_estimator must be one of {GRAD_ESTIMATORS}")
        if self.dp_mode not in ("gspmd", "shard_map"):
            raise ValueError("dp_mode must be gspmd or shard_map")
        if self.steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if self.dsteps < 1 or self.gsteps < 1 or self.start_dsteps < 1:
            # zero-length scans fail at trace time with an opaque
            # "need at least one array to stack"
            raise ValueError("dsteps/gsteps/start_dsteps must be >= 1")
        if not self.global_batch_mmd and (
                self.model == "tmmd" or self.gradient_penalty > 0):
            # critic_loss's tmmd branch and the witness GP always use
            # the gathered global features — honoring the local-only
            # estimator there would silently change the objective, so
            # the combination is rejected instead
            raise ValueError(
                "global_batch_mmd=False is not supported with model="
                "'tmmd' or gradient_penalty>0 (those paths compute the "
                "global-batch estimator)")
        if not (0.0 <= self.ema_decay < 1.0):
            raise ValueError(
                f"ema_decay must be in [0, 1), got {self.ema_decay}")
        if self.three_sample_test not in ("pvalue", "vote"):
            raise ValueError("three_sample_test must be pvalue or vote")
        if self.on_device_data and self.dataset != "synthetic":
            raise ValueError(
                "on_device_data synthesizes batches in-program and is only "
                "meaningful for dataset='synthetic'")
        if self.on_device_data and self.compute_scores:
            raise ValueError(
                "on_device_data draws uniform noise on-device — a DIFFERENT "
                "distribution from the host SyntheticImages source scoring "
                "would compare against; FID/KID/scheduler decisions would be "
                "meaningless. It is a measurement / hostless-smoke mode: "
                "disable compute_scores with it.")
        if self.data_placement not in ("host", "device"):
            raise ValueError("data_placement must be host or device")
        if self.device_data_sharding not in ("replicated", "sharded"):
            raise ValueError(
                "device_data_sharding must be replicated or sharded")
        if self.data_placement == "device" and self.on_device_data:
            raise ValueError(
                "data_placement=device gathers the real dataset in-program; "
                "on_device_data synthesizes noise in-program — pick one")
        up = self.use_pallas
        if isinstance(up, bool):
            up = "on" if up else "off"
        elif isinstance(up, str) and up.lower() in ("true", "1", "yes"):
            up = "on"
        elif isinstance(up, str) and up.lower() in ("false", "0", "no"):
            up = "off"
        if up not in ("on", "off", "auto"):
            raise ValueError(f"use_pallas must be on/off/auto, got {self.use_pallas!r}")
        object.__setattr__(self, "use_pallas", up)
        if self.use_ring_mmd and self.dp_mode == "gspmd" \
                and self.num_data_shards > 1:
            object.__setattr__(self, "dp_mode", "shard_map")
        # model implies regularizer wiring, mirroring the reference dispatch
        if self.model in ("smmd", "sn-smmd") and not self.with_scaling:
            object.__setattr__(self, "with_scaling", True)
        if self.model == "sn-smmd" and not self.with_sn:
            object.__setattr__(self, "with_sn", True)

    # Resolved learning rates ------------------------------------------------
    @property
    def lr_g(self) -> float:
        return self.learning_rate if self.g_learning_rate is None else self.g_learning_rate

    @property
    def lr_d(self) -> float:
        return self.learning_rate if self.d_learning_rate is None else self.d_learning_rate

    # --- toy problem -------------------------------------------------------
    toy_dim: int = 1                 # sample dim for gaussian_mix / mlp arch

    @property
    def image_shape(self) -> Tuple[int, ...]:
        """Shape of one data sample (alias: the toy problem is 1-D)."""
        if self.architecture == "mlp" or self.dataset == "gaussian_mix":
            return (self.toy_dim,)
        return (self.output_size, self.output_size, self.c_dim)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def run_name(self) -> str:
        tag = f"{self.dataset}_{self.architecture}_{self.model}_{self.kernel}_b{self.batch_size}"
        return tag + (f"_{self.suffix}" if self.suffix else "")


def _add_bool(p: argparse.ArgumentParser, name: str, default: bool, help: str = ""):
    p.add_argument(f"--{name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=default, help=help)


def build_argparser() -> argparse.ArgumentParser:
    """CLI mirroring the reference ``main.py`` flag names (SURVEY.md #1)."""
    p = argparse.ArgumentParser("smmdax", description=__doc__)
    defaults = Config()
    for f in dataclasses.fields(Config):
        if f.type == "bool" or isinstance(getattr(defaults, f.name), bool):
            _add_bool(p, f.name, getattr(defaults, f.name))
        elif f.name in ("rbf_sigmas", "rq_alphas"):
            p.add_argument(f"--{f.name}", type=float, nargs="+",
                           default=list(getattr(defaults, f.name)))
        elif f.name in ("g_learning_rate", "d_learning_rate"):
            p.add_argument(f"--{f.name}", type=float, default=None)
        else:
            p.add_argument(f"--{f.name}", type=type(getattr(defaults, f.name)),
                           default=getattr(defaults, f.name))
    return p


def config_from_namespace(ns: argparse.Namespace) -> Config:
    """Config from a parsed namespace, ignoring any non-Config
    attributes (so tools can extend build_argparser() with their own
    flags and still build the Config here — one place owns the
    list->tuple coercions)."""
    names = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(ns).items() if k in names}
    kw["rbf_sigmas"] = tuple(kw["rbf_sigmas"])
    kw["rq_alphas"] = tuple(kw["rq_alphas"])
    return Config(**kw)


def config_from_args(argv: Optional[Sequence[str]] = None) -> Config:
    return config_from_namespace(build_argparser().parse_args(argv))
