"""Pallas auto-dispatch (smmdax/pallas/dispatch.py — VERDICT item 5).

The decision is a pure trace-time function of (mode, kernel, shapes,
platform); both arms must produce the same estimator value (the fused
path is interpret-mode on CPU here; TPU timings live in BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import smmdax.pallas.mmd_kernel as pk
from smmdax.configs import Config
from smmdax.losses import mmd2_objective
from smmdax.pallas.dispatch import should_use_pallas


def test_mode_on_off_override_size():
    for plat in ("cpu", "tpu", "axon"):
        assert should_use_pallas("on", "rq", 4, 4, platform=plat)
        assert not should_use_pallas("off", "rq", 10**6, 10**6, platform=plat)
    # bools are accepted (Config normalizes, but the function is public)
    assert should_use_pallas(True, "gaussian", 4, 4, platform="cpu")
    assert not should_use_pallas(False, "gaussian", 10**6, 10**6, platform="tpu")


def test_auto_uses_size_crossover_on_accelerators():
    assert not should_use_pallas("auto", "rq", 64, 64, platform="tpu")
    assert should_use_pallas("auto", "rq", 8192, 8192, platform="tpu")
    assert should_use_pallas("auto", "rq", 64, 8192, platform="axon")
    assert should_use_pallas("auto", "rq", 4096, 4096, min_rows=4096,
                             platform="tpu")
    # interpret-mode Pallas is never a win: auto on CPU is always dense
    assert not should_use_pallas("auto", "rq", 10**6, 10**6, platform="cpu")


def test_every_loss_kernel_dispatches():
    # the full loss-surface kernel set rides the fused path: the
    # mixtures, energy-distance, and (via the empty-mixture canonical
    # form) the pure dot kernel's data-dependent diagonal
    for kernel in ("gaussian", "rq", "distance", "dot"):
        assert should_use_pallas("on", kernel, 64, 64, platform="tpu")
    assert not should_use_pallas("on", "nope", 64, 64, platform="tpu")


def test_unknown_mode_raises():
    with pytest.raises(ValueError, match="on/off/auto"):
        should_use_pallas("sometimes", "rq", 64, 64, platform="tpu")


def test_config_normalizes_bool_and_string_modes():
    assert Config(use_pallas=True).use_pallas == "on"
    assert Config(use_pallas=False).use_pallas == "off"
    assert Config(use_pallas="true").use_pallas == "on"
    assert Config(use_pallas="FALSE").use_pallas == "off"
    assert Config().use_pallas == "auto"
    with pytest.raises(ValueError, match="use_pallas"):
        Config(use_pallas="maybe")


def test_dispatch_arms_agree_in_value():
    """mmd2_objective under use_pallas on vs off: same estimator."""
    old = pk._INTERPRET
    pk._INTERPRET = True
    try:
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        f_fake = jax.random.normal(k1, (96, 16)) * 0.8
        f_real = jax.random.normal(k2, (96, 16)) + 0.2
        vals = {}
        for mode in ("on", "off"):
            cfg = Config(model="mmd", kernel="rq", use_pallas=mode)
            vals[mode] = float(mmd2_objective(cfg, f_fake, f_real))
        assert vals["on"] == pytest.approx(vals["off"], rel=2e-4, abs=1e-6)
    finally:
        pk._INTERPRET = old


def test_auto_is_dense_on_cpu_even_above_threshold():
    """auto on the CPU test backend resolves to the dense oracle (no
    interpret-mode Pallas in the trace), including above min_rows."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    f_fake = jax.random.normal(k1, (128, 8))
    f_real = jax.random.normal(k2, (128, 8))
    cfg = Config(model="mmd", kernel="rq", pallas_min_rows=64)  # < 128 rows
    # would crash on CPU if the fused path were traced (Mosaic kernels
    # don't lower on the CPU backend outside interpret mode)
    v = float(mmd2_objective(cfg, f_fake, f_real))
    assert np.isfinite(v)


def test_gspmd_multishard_never_dispatches_pallas(monkeypatch):
    """A pallas_call is opaque to the GSPMD partitioner, so auto/on must
    resolve to the dense path inside multi-shard gspmd programs — the
    step must compile and run on the mesh even with a tiny crossover."""
    from smmdax.data import make_dataset
    from smmdax.train import create_state, jit_train_step, make_mesh

    cfg = Config(model="mmd", kernel="rq", architecture="dcgan",
                 dataset="synthetic", output_size=32, batch_size=16,
                 real_batch_size=16, gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                 dsteps=1, gsteps=1, num_data_shards=8,
                 use_pallas="on", pallas_min_rows=1)
    src = make_dataset(cfg)
    flat = src.batch(2 * cfg.batch_size, key=0)
    batch = jnp.asarray(flat.reshape((2, cfg.batch_size) + flat.shape[1:]))
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg, 1, 1, mesh=make_mesh(8), mode="gspmd")
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss_mmd2"]))
