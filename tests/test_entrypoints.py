"""End-to-end entry-point tests: multi-shard Trainer wiring, main.py
sampling path, compute_scores.py CLI, and the graft entry."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ,
       "JAX_PLATFORMS": "cpu",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
ENV.pop("PALLAS_AXON_POOL_IPS", None)


def test_trainer_with_data_mesh(tmp_path):
    """Trainer drives the GSPMD mesh path when num_data_shards > 1."""
    cfg = Config(dataset="synthetic", architecture="dcgan", model="mmd",
                 batch_size=16, real_batch_size=16, output_size=32,
                 gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                 dsteps=1, gsteps=1, start_dsteps=1, max_iteration=2,
                 num_data_shards=8, MMD_lr_scheduler=False,
                 log_every=1, sample_every=0, checkpoint_every=0,
                 checkpoint_dir=str(tmp_path / "ck"),
                 sample_dir=str(tmp_path / "s"),
                 log_dir=str(tmp_path / "l"))
    assert jax.device_count() >= 8
    state = Trainer(cfg).train()
    assert int(state.step) == 2


def test_main_sampling_cli(tmp_path):
    out = subprocess.run(
        [sys.executable, "main.py",
         "--is_train", "false", "--dataset", "synthetic",
         "--architecture", "dcgan", "--model", "mmd",
         "--batch_size", "8", "--output_size", "32",
         "--gf_dim", "8", "--df_dim", "8", "--dof_dim", "4",
         "--z_dim", "8", "--no_of_samples", "16",
         "--checkpoint_dir", str(tmp_path / "ck"),
         "--sample_dir", str(tmp_path / "s"),
         "--log_dir", str(tmp_path / "l")],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    run_dirs = os.listdir(tmp_path / "s")
    assert len(run_dirs) == 1
    files = os.listdir(tmp_path / "s" / run_dirs[0])
    assert "samples.png" in files and "samples.npy" in files


def test_compute_scores_cli(tmp_path):
    rng = np.random.default_rng(0)
    real = rng.standard_normal((500, 16)).astype(np.float32)
    fake = (rng.standard_normal((500, 16)) + 0.5).astype(np.float32)
    rp, fp = str(tmp_path / "r.npy"), str(tmp_path / "f.npy")
    np.save(rp, real)
    np.save(fp, fake)
    out = subprocess.run(
        [sys.executable, "compute_scores.py", rp, fp,
         "--subset_size", "250", "--n_subsets", "5"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FID:" in out.stdout and "KID:" in out.stdout


def test_compute_scores_loads_mixed_size_image_dir(tmp_path):
    """Directories with heterogeneous image resolutions must load (the
    reference pipeline scored arbitrary-size samples; the extractor
    resizes anyway) — everything is resized to the modal size."""
    from PIL import Image

    import compute_scores

    rng = np.random.default_rng(3)
    for i, hw in enumerate([(16, 16), (16, 16), (24, 20)]):
        arr = rng.integers(0, 255, (hw[0], hw[1], 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"im{i}.png")
    imgs = compute_scores._load(str(tmp_path))
    assert imgs.shape == (3, 16, 16, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0


def test_compute_scores_cli_relative_test(tmp_path):
    """--compare runs the Bounliphone three-sample test between two
    candidate sets (small p = first candidate significantly closer)."""
    rng = np.random.default_rng(1)
    real = rng.standard_normal((600, 16)).astype(np.float32)
    close = (rng.standard_normal((600, 16)) + 0.1).astype(np.float32)
    far = (rng.standard_normal((600, 16)) + 1.0).astype(np.float32)
    rp, cp, fp = (str(tmp_path / n) for n in ("r.npy", "c.npy", "f.npy"))
    np.save(rp, real)
    np.save(cp, close)
    np.save(fp, far)
    out = subprocess.run(
        [sys.executable, "compute_scores.py", rp, cp, "--compare", fp,
         "--subset_size", "300", "--n_subsets", "3"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "relative-MMD test" in out.stdout
    assert "FAKE significantly closer" in out.stdout


def test_main_visualize_interpolation_cli(tmp_path):
    """--visualize produces the latent interpolation grid alongside the
    sample grid (the reference lineage's visualize option)."""
    out = subprocess.run(
        [sys.executable, "main.py",
         "--is_train", "false", "--visualize", "true",
         "--dataset", "synthetic", "--architecture", "dcgan",
         "--model", "mmd", "--batch_size", "8", "--output_size", "32",
         "--gf_dim", "8", "--df_dim", "8", "--dof_dim", "4",
         "--z_dim", "8",
         "--checkpoint_dir", str(tmp_path / "ck"),
         "--sample_dir", str(tmp_path / "s"),
         "--log_dir", str(tmp_path / "l")],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    run_dir = os.path.join(tmp_path / "s", os.listdir(tmp_path / "s")[0])
    assert "interpolation.png" in os.listdir(run_dir)

    # endpoints of each interpolation row vary; midpoints are between
    from smmdax.train import create_state, interpolate
    cfg = Config(dataset="synthetic", architecture="dcgan", model="mmd",
                 batch_size=8, output_size=32, gf_dim=8, df_dim=8,
                 dof_dim=4, z_dim=8)
    state = create_state(cfg, jax.random.PRNGKey(0))
    grid = np.asarray(interpolate(cfg, state, jax.random.PRNGKey(1),
                                  rows=2, cols=5))
    assert grid.shape == (10, 32, 32, 3)
    assert not np.allclose(grid[0], grid[4])   # row endpoints differ
