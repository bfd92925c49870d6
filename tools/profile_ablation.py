"""MFU bottleneck attribution for the flagship config (VERDICT r2
weak #3 follow-through).

The device-bound MFU curve (bench.py batch sweep, on-device data)
plateaus around ~25% at B>=256 on TPU v5e.  This tool names where the
rest goes: it times the SAME on-device macro-step under feature
ablations, so the delta between rows attributes cost to a component
(spectral norm, the sigma double-backprop, the penalty path, dtype,
estimator).  Each row also reports its own XLA cost-analysis FLOPs, so
"cheaper because it does fewer FLOPs" and "cheaper because it runs
the same FLOPs faster" are distinguishable.

Run on the TPU:  python tools/profile_ablation.py [--batch 256]
Prints one JSON line per ablation.
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

# runnable as `python tools/profile_ablation.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ablations(batch: int):
    from smmdax.configs import Config
    base = dict(kernel="rq", architecture="resnet", dataset="synthetic",
                output_size=32, batch_size=batch, real_batch_size=batch,
                dof_dim=16, dsteps=5, gsteps=1, random_seed=0,
                on_device_data=True)
    flag = dict(compute_dtype="bfloat16", scaling_grad_estimator="hutchinson")
    return {
        "flagship_sn_smmd": Config(model="sn-smmd", **flag, **base),
        "no_sn (smmd)": Config(model="smmd", **flag, **base),
        "no_sigma (mmd+sn)": Config(model="mmd", with_sn=True,
                                    compute_dtype="bfloat16", **base),
        "plain_mmd": Config(model="mmd", compute_dtype="bfloat16", **base),
        "sigma_exact": Config(model="sn-smmd", compute_dtype="bfloat16",
                              scaling_grad_estimator="exact", **base),
        "f32_convs": Config(model="sn-smmd", compute_dtype="float32",
                            scaling_grad_estimator="hutchinson", **base),
        "gp_witness": Config(model="mmd", gradient_penalty=1.0,
                             compute_dtype="bfloat16", **base),
    }


def _time_step(cfg, windows: int = 3, steps: int = 10):
    from smmdax.train import create_state, jit_train_step_on_device
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step_on_device(cfg, cfg.dsteps, cfg.gsteps)
    for _ in range(2):
        state, metrics = step(state)
        float(metrics["d_loss_mmd2"])
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            state, metrics = step(state)
        _ = [float(jnp.sum(x)) for x in jax.tree.leaves(state.d_params)[:3]]
        float(metrics["d_loss_mmd2"])
        times.append((time.time() - t0) / steps)
    med = statistics.median(times)
    # FLOPs via the unrolled straight-line oracle: the production
    # lowering lax.scans the d/g alternation and XLA cost analysis
    # counts scan bodies once, undercounting ~3x at 5d+1g (the
    # on-device program differs only by the RNG batch synthesis)
    from smmdax.train import macro_step_flops
    flops = macro_step_flops(cfg.replace(on_device_data=False),
                             cfg.dsteps, cfg.gsteps)
    return med, flops


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    a = p.parse_args(argv)
    from smmdax.train import enable_compilation_cache
    enable_compilation_cache()
    dev = jax.devices()[0]
    from bench import PEAK_FLOPS      # single source of per-chip peaks
    peak = PEAK_FLOPS.get(dev.device_kind)
    per_step_imgs = None
    for name, cfg in _ablations(a.batch).items():
        med, flops = _time_step(cfg)
        per_step_imgs = (cfg.dsteps + cfg.gsteps) * cfg.batch_size
        row = {"ablation": name, "macro_step_ms": round(med * 1e3, 1),
               "images_per_sec": round(per_step_imgs / med, 1)}
        if flops:
            row["tflops"] = round(flops / 1e12, 2)
            row["tflops_per_sec"] = round(flops / med / 1e12, 2)
            if peak:
                row["mfu"] = round(flops / med / peak, 4)
        print(json.dumps(row))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
