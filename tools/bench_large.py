"""Link-independent large-image macro-step measurement (VERDICT r2
weak #2).

The tunneled TPU link made CelebA-160 wall times swing 377 -> 1045 ms
round-to-round on the same config (BASELINE.md critic-fusion row): a
29.5 MB uint8 macro-batch rides the tunnel every step, so the wall
number measures link weather, not the framework.  This tool measures
the same configs with ``jit_train_step_on_device`` — batches are drawn
in-program from the state RNG, ZERO host->device transfer — giving a
stable device-bound number, alongside one tunneled (host-fed) row for
honesty.

Run on the TPU:  python tools/bench_large.py [--quick]

Prints one JSON line per config with median/spread over windows.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# runnable as `python tools/bench_large.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _configs():
    from smmdax.configs import Config
    common = dict(model="sn-smmd", kernel="rq", dataset="synthetic",
                  random_seed=0, dsteps=5, gsteps=1,
                  compute_dtype="bfloat16",
                  scaling_grad_estimator="hutchinson")
    base = {
        # ImageNet-64 shapes (BASELINE.md round-2 row: 256 ms tunneled).
        # remat measured PURE WASTE at B=64 on v5e-16GB: activations
        # fit, and recompute costs ~30% (110.3 -> 84.9 ms) — derived
        # *_remat variants keep the tradeoff measured.
        "resnet64_b64": Config(architecture="resnet", output_size=64,
                               batch_size=64, real_batch_size=64,
                               dof_dim=16, remat=False, **common),
        # the paper's deepest config — CelebA 160x160 deep resnet
        # (BASELINE.md: 377 ms r1 vs 1045-1079 ms r2, same config);
        # also fits WITHOUT remat at B=64 (358.5 -> 276.6 ms)
        "celeba160_b64": Config(architecture="resnet", output_size=160,
                                batch_size=64, real_batch_size=64,
                                gf_dim=32, df_dim=32, dof_dim=16,
                                remat=False, **common),
    }
    # derive, never copy: a shape tweak to a base config must not
    # desynchronize its remat pair (the delta IS the measurement)
    return {**base, **{f"{name}_remat": cfg.replace(remat=True)
                       for name, cfg in base.items()}}


def _measure_on_device(cfg, windows: int, steps_per_window: int) -> dict:
    from smmdax.train import create_state, jit_train_step_on_device
    state = create_state(cfg, jax.random.PRNGKey(cfg.random_seed))
    step = jit_train_step_on_device(cfg, cfg.dsteps, cfg.gsteps)
    t0 = time.time()
    # compile + warm: enough dispatches that the first timed window is
    # past residual warm-in (measured: window 1 read 149 vs 111 ms
    # steady-state with only 2 warm dispatches)
    for _ in range(6):
        state, metrics = step(state)
        float(metrics["d_loss_mmd2"])
    compile_s = time.time() - t0
    per_step = cfg.dsteps + cfg.gsteps
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps_per_window):
            state, metrics = step(state)
        # completion barrier (async/tunneled platform): materialize
        # params + a metric — cannot return before the chain executed
        _ = [float(jnp.sum(x))
             for x in jax.tree.leaves(state.d_params)[:3]]
        float(metrics["d_loss_mmd2"])
        times.append((time.time() - t0) / steps_per_window)
    med = statistics.median(times)
    out = {
        "macro_step_ms": round(med * 1e3, 1),
        "images_per_sec": round(per_step * cfg.batch_size / med, 1),
        "window_ms": [round(t * 1e3, 1) for t in times],
        "spread_pct": round(100 * (max(times) - min(times)) / med, 1),
        "compile_s": round(compile_s, 1),
    }
    # MFU via the unrolled FLOPs oracle (scan bodies are counted once
    # by XLA cost analysis — see smmdax.train.macro_step_flops)
    from smmdax.train import macro_step_flops
    flops = macro_step_flops(cfg.replace(on_device_data=False),
                             cfg.dsteps, cfg.gsteps)
    if flops:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import PEAK_FLOPS
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
        out["tflops_per_step"] = round(flops / 1e12, 3)
        out["tflops_per_sec"] = round(flops / med / 1e12, 2)
        if peak:
            out["mfu"] = round(flops / med / peak, 4)
    return out


def _measure_tunneled(cfg, windows: int, steps_per_window: int) -> dict:
    """The host-fed path (uint8 over the link) for comparison.  Host
    batch assembly runs on a producer thread exactly like the Trainer,
    so the timed window measures device + transfer, not host numpy
    serialized with dispatch (which would overstate the link's cost)."""
    import queue
    import threading

    from smmdax.data import make_dataset
    from smmdax.train import create_state, jit_train_step
    source = make_dataset(cfg)
    per_step = cfg.dsteps + cfg.gsteps
    state = create_state(cfg, jax.random.PRNGKey(cfg.random_seed))
    step = jit_train_step(cfg, cfg.dsteps, cfg.gsteps)

    def make(i):
        flat = source.batch_u8(per_step * cfg.batch_size, key=i)
        return flat.reshape((per_step, cfg.batch_size) + flat.shape[1:])

    warm = 4
    total = warm + windows * steps_per_window
    q: "queue.Queue" = queue.Queue(maxsize=4)
    threading.Thread(
        target=lambda: [q.put(make(i)) for i in range(total)],
        daemon=True).start()

    for _ in range(warm):
        state, metrics = step(state, jnp.asarray(q.get(timeout=300)))
        float(metrics["d_loss_mmd2"])
    times = []
    for w in range(windows):
        t0 = time.time()
        for _ in range(steps_per_window):
            state, metrics = step(state, jnp.asarray(q.get(timeout=300)))
        _ = [float(jnp.sum(x))
             for x in jax.tree.leaves(state.d_params)[:3]]
        float(metrics["d_loss_mmd2"])
        times.append((time.time() - t0) / steps_per_window)
    med = statistics.median(times)
    return {
        "macro_step_ms": round(med * 1e3, 1),
        "images_per_sec": round(per_step * cfg.batch_size / med, 1),
        "window_ms": [round(t * 1e3, 1) for t in times],
        "spread_pct": round(100 * (max(times) - min(times)) / med, 1),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="fewer/shorter windows")
    p.add_argument("--configs", nargs="*", default=None,
                   help="subset of config names")
    a = p.parse_args(argv)
    windows = 3 if a.quick else 5
    spw = 5 if a.quick else 10

    from smmdax.train import enable_compilation_cache
    enable_compilation_cache()
    dev = jax.devices()[0]
    for name, cfg in _configs().items():
        if a.configs and name not in a.configs:
            continue
        row = {"config": name, "device": dev.device_kind,
               "on_device_data": _measure_on_device(cfg, windows, spw)}
        # remat changes on-chip recompute, not the uint8 transfer: the
        # tunneled arm would duplicate the base config's link row at
        # minutes-per-row cost, so only base configs measure it
        if not name.endswith("_remat"):
            row["tunneled_u8"] = _measure_tunneled(cfg, windows, spw)
        print(json.dumps(row))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
