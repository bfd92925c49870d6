"""Generator export (tools/export_generator.py): the serving-path
deployment artifact — eval-mode G lowered to StableHLO with weights
baked in, loadable by any matching PJRT runtime without this repo
(the compiled-artifact analog of the reference lineage's frozen TF
GraphDef shipping)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from smmdax.configs import Config
from smmdax.train import create_state


def _tiny_cfg(**kw):
    return Config(model="sn-smmd", kernel="rq", architecture="dcgan",
                  dataset="synthetic", output_size=32, batch_size=8,
                  real_batch_size=8, gf_dim=8, df_dim=8, dof_dim=4,
                  z_dim=8, dsteps=1, gsteps=1, random_seed=0, **kw)


def test_export_roundtrip_matches_direct_apply(tmp_path):
    import export_generator as eg

    from smmdax.nn import build_models
    cfg = _tiny_cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    blob = eg.export_generator(cfg, state, batch=8)
    path = str(tmp_path / "gen.shlo")
    with open(path, "wb") as f:
        f.write(blob)

    loaded = eg.load_generator(path)
    z = jax.random.uniform(jax.random.PRNGKey(1), (8, cfg.z_dim),
                           minval=-1.0, maxval=1.0)
    got = np.asarray(loaded.call(z))

    gen, _ = build_models(cfg)
    want = np.asarray(gen.apply({"params": state.g_params,
                                 "batch_stats": state.g_batch_stats},
                                z, train=False))
    assert got.shape == (8, 32, 32, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_cli_from_trained_checkpoint(tmp_path, capsys):
    """End to end: train 2 steps via the Trainer (checkpoint saved),
    export --use_best-less latest via the CLI, artifact + metadata on
    disk, loaded generator produces finite images in [-1, 1]."""
    import export_generator as eg

    from smmdax.trainer import Trainer
    ckpt = str(tmp_path / "ckpt")
    cfg = _tiny_cfg(max_iteration=2, checkpoint_every=1,
                    checkpoint_dir=ckpt,
                    sample_dir=str(tmp_path / "s"),
                    log_dir=str(tmp_path / "l"))
    Trainer(cfg).train()

    out = str(tmp_path / "gen.shlo")
    eg.main(["--model", "sn-smmd", "--architecture", "dcgan",
             "--dataset", "synthetic", "--output_size", "32",
             "--batch_size", "8", "--real_batch_size", "8",
             "--gf_dim", "8", "--df_dim", "8", "--dof_dim", "4",
             "--z_dim", "8", "--checkpoint_dir", ckpt,
             "--out", out, "--batch", "4"])
    assert os.path.exists(out) and os.path.exists(out + ".json")
    assert "restored latest checkpoint at step 2" in capsys.readouterr().out

    loaded = eg.load_generator(out)
    z = jnp.zeros((4, 8), jnp.float32)
    img = np.asarray(loaded.call(z))
    assert img.shape == (4, 32, 32, 3)
    assert np.isfinite(img).all() and img.min() >= -1.0 and img.max() <= 1.0


def test_export_cli_refuses_empty_checkpoint_dir(tmp_path):
    import export_generator as eg
    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    with pytest.raises(SystemExit, match="no checkpoint"):
        eg.main(["--architecture", "dcgan", "--output_size", "32",
                 "--gf_dim", "8", "--df_dim", "8", "--z_dim", "8",
                 "--checkpoint_dir", empty,
                 "--out", str(tmp_path / "x.shlo")])


def test_export_cli_refuses_missing_checkpoint_dir(tmp_path):
    """A typo'd --checkpoint_dir must be fatal, never a silent export
    of random weights masquerading as a trained artifact."""
    import export_generator as eg
    with pytest.raises(SystemExit, match="not found"):
        eg.main(["--architecture", "dcgan", "--output_size", "32",
                 "--gf_dim", "8", "--df_dim", "8", "--z_dim", "8",
                 "--checkpoint_dir", str(tmp_path / "typo"),
                 "--out", str(tmp_path / "x.shlo")])


def test_export_cli_allow_untrained_escape_hatch(tmp_path, capsys):
    import export_generator as eg
    out = str(tmp_path / "smoke.shlo")
    eg.main(["--architecture", "dcgan", "--output_size", "32",
             "--batch_size", "8", "--real_batch_size", "8",
             "--gf_dim", "8", "--df_dim", "8", "--dof_dim", "4",
             "--z_dim", "8",
             "--checkpoint_dir", str(tmp_path / "typo"),
             "--allow_untrained", "--out", out, "--batch", "4"])
    assert os.path.exists(out) and os.path.exists(out + ".json")
    assert "UNTRAINED" in capsys.readouterr().out
