"""MFU bottleneck attribution for the flagship config (VERDICT r2
weak #3 follow-through).

The device-bound MFU curve (bench.py batch sweep, on-device data) sits
at ~68-72% of the v5e bf16 peak under the corrected FLOPs accounting
(smmdax.train.macro_step_flops).  This tool names where the remaining
~30% goes: it times the SAME on-device macro-step under feature
ablations, so the delta between rows attributes cost to a component
(spectral norm, the sigma double-backprop, the penalty path, dtype,
estimator).  Each row also reports its own FLOPs via the unrolled
oracle, so "cheaper because it does fewer FLOPs" and "cheaper because
it runs the same FLOPs faster" are distinguishable.  Configs are timed
in interleaved round-robin passes so chip-state drift on the shared
tunneled chip cannot masquerade as a component cost.

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


class _Runner:
    """One compiled ablation config, re-timeable across passes."""

    def __init__(self, cfg):
        from smmdax.train import create_state, jit_train_step_on_device
        self.cfg = cfg
        self.state = create_state(cfg, jax.random.PRNGKey(0))
        self.step = jit_train_step_on_device(cfg, cfg.dsteps, cfg.gsteps)
        for _ in range(2):                       # compile + settle
            self.state, m = self.step(self.state)
            float(m["d_loss_mmd2"])
        self.times = []

    def window(self, steps: int = 10) -> None:
        t0 = time.time()
        for _ in range(steps):
            self.state, m = self.step(self.state)
        _ = [float(jnp.sum(x)) for x in jax.tree.leaves(self.state.d_params)[:3]]
        float(m["d_loss_mmd2"])
        self.times.append((time.time() - t0) / steps)

    def flops(self):
        # FLOPs via the unrolled straight-line oracle: the production
        # lowering lax.scans the d/g alternation and XLA cost analysis
        # counts scan bodies once, undercounting ~3x at 5d+1g (the
        # on-device program differs only by the RNG batch synthesis)
        from smmdax.train import macro_step_flops
        return macro_step_flops(self.cfg.replace(on_device_data=False),
                                self.cfg.dsteps, self.cfg.gsteps)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--passes", type=int, default=3,
                   help="interleaved timing passes over all configs")
    a = p.parse_args(argv)
    if a.passes < 1:
        p.error("--passes must be >= 1")
    from smmdax.train import enable_compilation_cache
    enable_compilation_cache()
    dev = jax.devices()[0]
    from bench import PEAK_FLOPS      # single source of per-chip peaks
    peak = PEAK_FLOPS.get(dev.device_kind)

    # Attribution needs the DELTA between configs, so chip-state drift
    # over the run must not land on one config: time all configs in
    # interleaved round-robin passes (a drifting minute inflates every
    # config's pass equally), take the per-config MEDIAN across passes,
    # and report the spread so residual drift is visible.  (A first
    # sequential version charged a transient entirely to whichever
    # config was running and manufactured a phantom 25 ms "SN cost".)
    runners = {name: _Runner(cfg) for name, cfg in
               _ablations(a.batch).items()}
    for _ in range(a.passes):
        for r in runners.values():
            r.window()
    for name, r in runners.items():
        med = statistics.median(r.times)
        per_step_imgs = (r.cfg.dsteps + r.cfg.gsteps) * r.cfg.batch_size
        row = {"ablation": name, "macro_step_ms": round(med * 1e3, 1),
               "window_ms": [round(t * 1e3, 1) for t in r.times],
               "spread_pct": round(100 * (max(r.times) - min(r.times)) / med, 1),
               "images_per_sec": round(per_step_imgs / med, 1)}
        flops = r.flops()
        if flops:
            row["tflops"] = round(flops / 1e12, 2)
            row["tflops_per_sec"] = round(flops / med / 1e12, 2)
            if peak:
                row["mfu"] = round(flops / med / peak, 4)
        print(json.dumps(row))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
