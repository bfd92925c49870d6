"""Headline benchmark: images/sec/chip, CIFAR-10 32x32 training.

Runs the flagship configuration (sn-smmd: ResNet critic with spectral
norm, RQ-mixture scaled MMD — BASELINE.json config #3) on whatever
device JAX provides (the driver runs this on one real TPU chip), using
synthetic CIFAR-10-shaped data so no downloadable asset is needed.

Metric definition: one macro-step = dsteps critic updates + gsteps
generator updates; images/sec counts the real images consumed per
macro-step (batch * (dsteps + gsteps)) divided by wall time, i.e. the
reference's per-sess.run batch accounting (SURVEY.md §6).

Round-3 structure (VERDICT r2 items 1+3):

* ``steps_per_dispatch`` sweep K in {1, 4, 8}: K macro-steps are fused
  into ONE lax.scan'ed XLA program and ONE uint8 transfer, amortizing
  the per-step host<->device round-trip that dominated the round-2 wall
  step (21.4 ms device vs 36-56 ms wall).  The headline runs at the
  best K from the sweep; per-K numbers are reported alongside.
* batch-size sweep B in {128, 256, 512} at the best K, reporting MFU
  per point — the measured answer to whether the B=64 step is
  launch/HBM-bound (MFU should climb with B) or hiding an inefficiency.
* device-resident arm (``data_placement=device``): the CIFAR-sized
  uint8 pool uploaded to HBM once, every batch gathered in-program
  from the RNG chain — zero per-step host transfer, link-weather-proof
  AND real-data training semantics.  The headline takes the better of
  the host-fed and device-resident arms (both recorded; ``placement``
  names the winner).

Robustness (VERDICT round-1 item 2): the tunneled link has ±20%
run-to-run variance, so the headline is the MEDIAN of ``N_WINDOWS``
independent timed windows (min/max recorded alongside).  FLOPs per
macro-step come from XLA's compiled-module cost analysis, giving
tflops/sec and MFU against the device's bf16 peak.

``vs_baseline``: the reference lineage never published throughput and
the reference mount is empty (BASELINE.md), so the baseline is our own
first recorded measurement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

# Our own round-1 TPU v5e measurement is the fixed baseline (no
# published reference number exists on this metric — BASELINE.md).
BASELINE_IMAGES_PER_SEC: float | None = 2369.78  # round-1, TPU v5e, 2026-08-16

WARMUP_STEPS = 3
N_WINDOWS = 5
STEPS_PER_WINDOW = 64
DISPATCH_SWEEP = (1, 4, 8)
BATCH_SWEEP = (64, 128, 256, 512)   # 64 = the [SPEC] point, measured
                                    # device-bound too so every run
                                    # records a link-weather-proof
                                    # flagship number alongside

# Peak dense-matmul throughput per chip for MFU accounting.  Keys match
# jax Device.device_kind.  TPU v5e (v5 lite): 197 TFLOP/s bf16.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
}


def _flagship_cfg(batch_size: int = 64, k: int = 1):
    from smmdax.configs import Config
    # Production configuration: every headline feature on (spectral
    # norm, scaled MMD, RQ mixture) with the optimized execution paths —
    # bfloat16 conv compute (params/MMD math stay f32) and the unbiased
    # Hutchinson estimator for the sigma Jacobian norm (one backward
    # pass instead of dof_dim; sigma is itself a minibatch estimate, so
    # an unbiased one-probe estimate preserves training semantics).
    # Measured sweep (TPU v5e, round 1): f32+exact 164 ms/macro-step ->
    # bf16+hutchinson 53 ms (3.1x).
    return Config(model="sn-smmd", kernel="rq", architecture="resnet",
                  dataset="synthetic", output_size=32, batch_size=batch_size,
                  real_batch_size=batch_size,
                  dof_dim=16, dsteps=5, gsteps=1, random_seed=0,
                  compute_dtype="bfloat16",
                  scaling_grad_estimator="hutchinson",
                  steps_per_dispatch=k)


class _Harness:
    """One (batch_size, steps_per_dispatch) benchmark arm: compiled
    program + deterministic uint8 macro-batch maker."""

    def __init__(self, batch_size: int, k: int):
        from smmdax.data import make_dataset
        from smmdax.train import create_state, jit_train_step
        self.cfg = _flagship_cfg(batch_size, k)
        self.k = k
        self.per_step = self.cfg.dsteps + self.cfg.gsteps
        self.source = make_dataset(self.cfg)
        self.state = create_state(self.cfg, jax.random.PRNGKey(0))
        self.step = jit_train_step(self.cfg, self.cfg.dsteps, self.cfg.gsteps,
                                   steps_per_dispatch=k)
        self._flops = None

    def flops_per_macro_step_k1(self) -> float | None:
        """FLOPs of ONE macro-step via the unrolled straight-line
        oracle (smmdax.train.macro_step_flops): XLA cost analysis
        counts a scan body ONCE regardless of trip count, so both the
        K-dispatch scan AND the inner dsteps/gsteps alternation scans
        undercount — the production lowering reports ~1 d-update + 1
        g-update (~3x low at 5d+1g).  Rounds 1-2 (and the first
        round-3 readings) used the scanned lowering; their MFU rows
        are corrected in BASELINE.md."""
        if self._flops is None:
            from smmdax.train import macro_step_flops
            cfg1 = self.cfg.replace(steps_per_dispatch=1)
            self._flops = macro_step_flops(cfg1, cfg1.dsteps, cfg1.gsteps)
        return self._flops

    def make_u8(self, dispatch_idx: int) -> np.ndarray:
        """One dispatch worth of fresh batches, exactly like the
        trainer: uint8 transfer, de-quantized in-step, keyed by step."""
        cfg, k = self.cfg, self.k
        parts = []
        for i in range(k):
            flat = self.source.batch_u8(self.per_step * cfg.batch_size,
                                        key=dispatch_idx * k + i)
            parts.append(flat.reshape((self.per_step, cfg.batch_size)
                                      + flat.shape[1:]))
        return parts[0] if k == 1 else np.stack(parts)

    def warmup(self, n: int = WARMUP_STEPS) -> float:
        t0 = time.time()
        for i in range(n):
            self.state, metrics = self.step(self.state, jnp.asarray(
                self.make_u8(10_000 + i)))
            float(metrics["d_loss_mmd2"])       # true round-trip per dispatch
        self.last_metrics = metrics
        return time.time() - t0

    def flops_per_macro_step(self) -> float | None:
        return self.flops_per_macro_step_k1()

    def timed_window(self, macro_steps: int, feed) -> float:
        """images/sec over one window; ``feed`` yields ready host
        arrays (prefetch handled by the caller)."""
        cfg = self.cfg
        n_disp = macro_steps // self.k
        t0 = time.time()
        for _ in range(n_disp):
            self.state, metrics = self.step(self.state, jnp.asarray(feed()))
        # completion barrier that cannot return early on this
        # async/tunneled platform: materialize parameters + a metric
        _ = [float(jnp.sum(x)) for x in jax.tree.leaves(self.state.d_params)[:3]]
        float(metrics["d_loss_mmd2"])
        self.last_metrics = metrics
        elapsed = time.time() - t0
        return n_disp * self.k * self.per_step * cfg.batch_size / elapsed


def _prefetching_feed(harness: _Harness, n_dispatches: int, start: int = 0):
    """Producer-thread prefetch, exactly like the Trainer: host batch
    assembly overlaps device execution, so the measurement is the
    device + transfer path, not host numpy speed."""
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=4)

    def _producer():
        for i in range(start, start + n_dispatches):
            q.put(harness.make_u8(i))

    threading.Thread(target=_producer, daemon=True).start()
    # bounded get: a dead producer must fail loudly, not hang the bench
    # holding the one-process-at-a-time chip claim
    return lambda: q.get(timeout=180)


def _measure(harness: _Harness, windows: int, steps_per_window: int,
             tag: str) -> dict:
    total_disp = windows * steps_per_window // harness.k
    feed = _prefetching_feed(harness, total_disp)
    ips = []
    for _ in range(windows):
        ips.append(harness.timed_window(steps_per_window, feed))
    med = statistics.median(ips)
    out = {"images_per_sec": round(med, 2),
           "windows": [round(w, 1) for w in ips],
           "min": round(min(ips), 2), "max": round(max(ips), 2)}
    flops = harness.flops_per_macro_step()
    dev = jax.devices()[0]
    peak = PEAK_FLOPS.get(dev.device_kind)
    if flops is not None:
        tflops_sec = flops * (med / (harness.per_step
                                     * harness.cfg.batch_size)) / 1e12
        out["tflops_per_sec"] = round(tflops_sec, 2)
        out["flops_per_macro_step"] = flops
        if peak is not None:
            out["mfu"] = round(tflops_sec * 1e12 / peak, 4)
    print(f"# {tag}: {med:.0f} img/s "
          f"(windows={['%.0f' % w for w in ips]}, "
          f"mfu={out.get('mfu', 'n/a')})")
    return out


def _measure_on_device_sweep(batch_size: int, k: int) -> dict:
    """One batch-size point of the MFU sweep: the same flagship config
    with in-program batch synthesis (jit_train_step_on_device)."""
    from smmdax.train import create_state, jit_train_step_on_device
    cfg = _flagship_cfg(batch_size, k)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step_on_device(cfg, cfg.dsteps, cfg.gsteps,
                                    steps_per_dispatch=k)
    t0 = time.time()
    for _ in range(2):
        state, metrics = step(state)
        float(metrics["d_loss_mmd2"])
    wu = time.time() - t0
    per_step = cfg.dsteps + cfg.gsteps
    # constant IMAGE budget per window across B: wall per window stays
    # flat while per-B dispatch counts shrink
    n_disp = max(2, STEPS_PER_WINDOW * 64 // batch_size // k)
    ips = []
    for _ in range(2):
        t0 = time.time()
        for _ in range(n_disp):
            state, metrics = step(state)
        _ = [float(jnp.sum(x)) for x in jax.tree.leaves(state.d_params)[:3]]
        float(metrics["d_loss_mmd2"])
        elapsed = time.time() - t0
        ips.append(n_disp * k * per_step * cfg.batch_size / elapsed)
    med = statistics.median(ips)
    out = {"images_per_sec": round(med, 2),
           "windows": [round(w, 1) for w in ips]}
    from smmdax.train import macro_step_flops
    flops = macro_step_flops(cfg.replace(steps_per_dispatch=1),
                             cfg.dsteps, cfg.gsteps)
    dev = jax.devices()[0]
    peak = PEAK_FLOPS.get(dev.device_kind)
    if flops is not None and peak is not None:
        tfs = flops * (med / (per_step * cfg.batch_size)) / 1e12
        out["tflops_per_sec"] = round(tfs, 2)
        out["mfu"] = round(tfs * 1e12 / peak, 4)
    print(f"# B={batch_size} K={k} on-device (warmup+compile {wu:.0f}s): "
          f"{med:.0f} img/s (windows={['%.0f' % w for w in ips]}, "
          f"mfu={out.get('mfu', 'n/a')})")
    return out


def _measure_device_resident(batch_size: int, k: int,
                             pool: int = 50_000) -> dict:
    """The production data path (``data_placement=device``): the whole
    uint8 dataset (CIFAR-10-sized pool) uploaded to HBM once, every
    batch gathered IN-PROGRAM from the RNG chain.  Zero per-step host
    transfer — this arm is link-weather-proof AND trains on real-data
    semantics (unlike the on-device synthesis sweep, scoring works
    with it), so it is the honest best-configuration headline."""
    from smmdax.data import make_dataset
    from smmdax.data.pipeline import materialize_u8
    from smmdax.train import create_state, jit_train_step_device_data
    cfg = _flagship_cfg(batch_size, k)
    src = make_dataset(cfg)
    data = jax.device_put(materialize_u8(src, pool))
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step_device_data(cfg, cfg.dsteps, cfg.gsteps,
                                      steps_per_dispatch=k)
    t0 = time.time()
    for _ in range(2):
        state, metrics = step(state, data)
        float(metrics["d_loss_mmd2"])
    wu = time.time() - t0
    per_step = cfg.dsteps + cfg.gsteps
    n_disp = max(2, STEPS_PER_WINDOW // k)
    ips = []
    for _ in range(N_WINDOWS):
        t0 = time.time()
        for _ in range(n_disp):
            state, metrics = step(state, data)
        _ = [float(jnp.sum(x)) for x in jax.tree.leaves(state.d_params)[:3]]
        float(metrics["d_loss_mmd2"])
        elapsed = time.time() - t0
        ips.append(n_disp * k * per_step * cfg.batch_size / elapsed)
    med = statistics.median(ips)
    out = {"images_per_sec": round(med, 2),
           "windows": [round(w, 1) for w in ips],
           "min": round(min(ips), 2), "max": round(max(ips), 2),
           "pool_samples": pool,
           "final_mmd2": round(float(metrics["d_loss_mmd2"]), 5)}
    from smmdax.train import macro_step_flops
    flops = macro_step_flops(cfg.replace(steps_per_dispatch=1),
                             cfg.dsteps, cfg.gsteps)
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    if flops is not None and peak is not None:
        tfs = flops * (med / (per_step * cfg.batch_size)) / 1e12
        out["tflops_per_sec"] = round(tfs, 2)
        out["mfu"] = round(tfs * 1e12 / peak, 4)
    print(f"# device-resident B={batch_size} K={k} "
          f"(warmup+compile {wu:.0f}s): {med:.0f} img/s "
          f"(windows={['%.0f' % w for w in ips]}, "
          f"mfu={out.get('mfu', 'n/a')})")
    return out


def _measure_sampling(batch: int = 512, windows: int = 3) -> dict:
    """Generator-serving throughput (reference call stack §3.3: load
    ckpt -> batched G(z)): eval-mode sampling through the memoized
    jitted apply — the inference path a deployed generator serves.
    Timing materializes the produced device array (block_until_ready on
    the output, no host fetch)."""
    from smmdax.train import create_state, sample
    cfg = _flagship_cfg(batch)
    state = create_state(cfg, jax.random.PRNGKey(0))
    n = batch * 4
    # warm up with the SAME n as the timed windows: the generator apply
    # is chunked at batch_size (shape-stable), but the final n-element
    # concatenate is a distinct program per n — a batch-sized warmup
    # left window 1 paying that compile over the remote-compile tunnel
    # (the 4.1k/29.4k/27.1k window skew in BASELINE.md)
    t0 = time.time()
    sample(cfg, state, jax.random.PRNGKey(1), n).block_until_ready()
    wu = time.time() - t0
    ips = []
    for i in range(windows):
        t0 = time.time()
        sample(cfg, state, jax.random.PRNGKey(2 + i), n).block_until_ready()
        ips.append(n / (time.time() - t0))
    med = statistics.median(ips)
    print(f"# sampling B={batch} (warmup+compile {wu:.0f}s): "
          f"{med:.0f} img/s (windows={['%.0f' % w for w in ips]})")
    return {"images_per_sec": round(med, 2), "batch": batch,
            "windows": [round(w, 1) for w in ips]}


def main() -> None:
    from smmdax.train import enable_compilation_cache
    enable_compilation_cache()

    t_all = time.time()
    # --- steps_per_dispatch sweep at the [SPEC] B=64 point ------------
    sweep_k = {}
    for k in DISPATCH_SWEEP:
        h = _Harness(64, k)
        wu = h.warmup()
        sweep_k[k] = _measure(h, windows=2, steps_per_window=STEPS_PER_WINDOW,
                              tag=f"K={k} B=64 (warmup+compile {wu:.0f}s)")
        del h
    best_k = max(sweep_k, key=lambda k: sweep_k[k]["images_per_sec"])

    # --- host-fed arm: median of N_WINDOWS at the best K --------------
    h = _Harness(64, best_k)
    h.warmup()
    host_fed = _measure(h, windows=N_WINDOWS,
                        steps_per_window=STEPS_PER_WINDOW,
                        tag=f"host-fed K={best_k} B=64")
    final_mmd2 = float(h.last_metrics["d_loss_mmd2"])
    del h

    # --- device-resident arm (data_placement=device) at the best K ----
    # the production path for HBM-fitting datasets: dataset uploaded
    # once, batches gathered in-program — zero per-step host transfer.
    dev_res = _measure_device_resident(64, best_k)

    # headline = the better data placement at the [SPEC] B=64 point;
    # both arms are recorded, and `placement` names the winner.
    if dev_res["images_per_sec"] > host_fed["images_per_sec"]:
        headline, placement = dev_res, "device"
        final_mmd2 = dev_res["final_mmd2"]
    else:
        headline, placement = host_fed, "host"

    # --- MFU ceiling: batch-size sweep, DEVICE-BOUND ------------------
    # on-device batch synthesis (zero host work / transfer): the sweep
    # answers "does MFU climb when the workload is MXU-bound?", so the
    # host producer must not be the bottleneck (a first host-fed run
    # measured 3.2k img/s at B=256 — pure producer starvation).
    sweep_b = {}
    for b in BATCH_SWEEP:
        sweep_b[b] = _measure_on_device_sweep(b, best_k)

    # --- generator-serving arm (inference-only sampling) --------------
    sampling = _measure_sampling()

    ips = headline["images_per_sec"]
    vs = ips / BASELINE_IMAGES_PER_SEC if BASELINE_IMAGES_PER_SEC else 1.0
    result = {
        "metric": "images/sec/chip (CIFAR-10 32x32 sn-smmd resnet train)",
        "value": ips,
        "unit": "images/sec",
        "vs_baseline": round(vs, 4),
        "steps_per_dispatch": best_k,
        "data_placement": placement,
        **{k: v for k, v in headline.items() if k != "images_per_sec"},
        "host_fed": {k: v for k, v in host_fed.items()
                     if k in ("images_per_sec", "min", "max", "mfu")},
        "device_resident": {k: v for k, v in dev_res.items()
                            if k in ("images_per_sec", "min", "max", "mfu")},
        "dispatch_sweep": {str(k): v["images_per_sec"]
                           for k, v in sweep_k.items()},
        "batch_sweep": {str(b): {"images_per_sec": v["images_per_sec"],
                                 "mfu": v.get("mfu")}
                        for b, v in sweep_b.items()},
        "sampling": sampling,
    }
    dev = jax.devices()[0]
    print(json.dumps(result))
    print(f"# device={dev.device_kind} platform={dev.platform} "
          f"best_k={best_k} total_bench_time={time.time() - t_all:.0f}s "
          f"final_mmd2={final_mmd2:.5f}")


if __name__ == "__main__":
    main()
