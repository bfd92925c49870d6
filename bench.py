"""Headline benchmark: images/sec/chip, CIFAR-10 32x32 training.

Runs the flagship configuration (sn-smmd: ResNet critic with spectral
norm, RQ-mixture scaled MMD — BASELINE.json config #3) on whatever
device JAX provides (the driver runs this on one real TPU chip), using
synthetic CIFAR-10-shaped data so no downloadable asset is needed.

Metric definition: one macro-step = dsteps critic updates + gsteps
generator updates; images/sec counts the real images consumed per
macro-step (batch * (dsteps + gsteps)) divided by wall time, i.e. the
reference's per-sess.run batch accounting (SURVEY.md §6).

``vs_baseline``: the reference lineage never published throughput and
the reference mount is empty (BASELINE.md), so the baseline is our own
first recorded measurement; until BENCH_r1.json exists this reports
1.0 by definition.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Our own round-1 TPU v5e measurement becomes the fixed baseline once
# recorded here (no published reference number exists to beat on this
# metric — BASELINE.md).
BASELINE_IMAGES_PER_SEC: float | None = 2369.78  # round-1, TPU v5e, 2026-08-16

WARMUP_STEPS = 3
TIMED_STEPS = 100


def main() -> None:
    from smmdax.configs import Config
    from smmdax.data import make_dataset
    from smmdax.train import (create_state, enable_compilation_cache,
                              jit_train_step)

    enable_compilation_cache()

    # Production configuration: every headline feature on (spectral
    # norm, scaled MMD, RQ mixture) with the optimized execution paths —
    # bfloat16 conv compute (params/MMD math stay f32) and the unbiased
    # Hutchinson estimator for the sigma Jacobian norm (one backward
    # pass instead of dof_dim; sigma is itself a minibatch estimate, so
    # an unbiased one-probe estimate preserves training semantics).
    # Measured sweep (TPU v5e, round 1): f32+exact 164 ms/macro-step ->
    # bf16+hutchinson 53 ms (3.1x).
    cfg = Config(model="sn-smmd", kernel="rq", architecture="resnet",
                 dataset="synthetic", output_size=32, batch_size=64,
                 dof_dim=16, dsteps=5, gsteps=1, random_seed=0,
                 compute_dtype="bfloat16",
                 scaling_grad_estimator="hutchinson")
    per_step = cfg.dsteps + cfg.gsteps

    source = make_dataset(cfg)

    def macro_u8(step_idx: int):
        # stream fresh batches exactly like the trainer: uint8 transfer
        # (4x less tunnel/PCIe traffic), de-quantized in-step
        from smmdax.data.pipeline import macro_batch_at
        b = macro_batch_at(source, step_idx, per_step, cfg.batch_size)
        return jnp.asarray(np.round((b + 1.0) * 127.5).astype(np.uint8))

    state = create_state(cfg, jax.random.PRNGKey(cfg.random_seed))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)

    # Timing discipline (this platform dispatches asynchronously and
    # block_until_ready on a long dispatch chain has been observed to
    # return early): warmup steps fetch a metric scalar each (forces
    # compile + a true round-trip); the timed section streams fresh
    # batches with NO per-step sync — the real training workload — and
    # completion is verified by materializing the final parameters to
    # host (device_get cannot return before the chain has executed).
    t0 = time.time()
    for i in range(WARMUP_STEPS):
        state, metrics = step(state, macro_u8(i))
        float(metrics["d_loss_mmd2"])
    compile_and_warmup = time.time() - t0

    t0 = time.time()
    for i in range(WARMUP_STEPS, WARMUP_STEPS + TIMED_STEPS):
        state, metrics = step(state, macro_u8(i))
    _ = [float(jnp.sum(x)) for x in jax.tree.leaves(state.d_params)[:3]]
    float(metrics["d_loss_mmd2"])
    elapsed = time.time() - t0

    images = TIMED_STEPS * per_step * cfg.batch_size
    ips = images / elapsed
    vs = ips / BASELINE_IMAGES_PER_SEC if BASELINE_IMAGES_PER_SEC else 1.0

    print(json.dumps({
        "metric": "images/sec/chip (CIFAR-10 32x32 sn-smmd resnet train)",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs, 4),
    }))
    print(f"# device={jax.devices()[0].device_kind} platform="
          f"{jax.devices()[0].platform} warmup+compile={compile_and_warmup:.1f}s "
          f"macro_step={elapsed / TIMED_STEPS * 1e3:.1f}ms "
          f"final_mmd2={float(metrics['d_loss_mmd2']):.5f}")


if __name__ == "__main__":
    main()
