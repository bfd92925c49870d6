"""CLI flag surface, utils, and transform tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config, config_from_args
from smmdax.data.transforms import (center_crop, normalize_uint8,
                                    random_crop, resize_down_pow2,
                                    standard_pipeline)
from smmdax.utils import inverse_transform, make_grid, save_images


def test_cli_reference_flag_names():
    """Every reference flag name parses (SURVEY.md component #1)."""
    cfg = config_from_args([
        "--dataset", "cifar10", "--architecture", "resnet",
        "--model", "sn-smmd", "--kernel", "rq",
        "--batch_size", "32", "--real_batch_size", "48",
        "--output_size", "32", "--c_dim", "3", "--z_dim", "64",
        "--gf_dim", "32", "--df_dim", "32", "--dof_dim", "8",
        "--learning_rate", "2e-4", "--beta1", "0.5", "--beta2", "0.9",
        "--dsteps", "3", "--gsteps", "1", "--start_dsteps", "6",
        "--gradient_penalty", "1.0", "--L2_discriminator_penalty", "0.1",
        "--with_scaling", "true", "--scaling_coeff", "5.0",
        "--scaling_variant", "grad", "--with_sn", "true",
        "--max_iteration", "100", "--MMD_lr_scheduler", "true",
        "--decay_rate", "0.5", "--compute_scores", "false",
        "--no_of_samples", "100", "--is_train", "true",
        "--visualize", "false", "--log", "true",
        "--data_dir", "/tmp/d", "--checkpoint_dir", "/tmp/c",
        "--sample_dir", "/tmp/s", "--log_dir", "/tmp/l",
        "--random_seed", "7", "--suffix", "trial",
    ])
    assert cfg.model == "sn-smmd" and cfg.with_sn and cfg.with_scaling
    assert cfg.real_batch_size == 48 and cfg.batch_size == 32
    assert cfg.run_name().endswith("_trial")


def test_cli_rejects_bad_values():
    with pytest.raises(ValueError):
        Config(model="nope")
    with pytest.raises(ValueError):
        Config(kernel="nope")
    with pytest.raises(ValueError):
        Config(scaling_grad_estimator="nope")


def test_grid_and_save(tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (9, 8, 8, 3)).astype(np.float32)
    grid = make_grid(inverse_transform(imgs))
    assert grid.ndim == 3 and grid.shape[-1] == 3
    path = os.path.join(tmp_path, "g.png")
    save_images(imgs, path)
    assert os.path.exists(path)


def test_transforms_shapes_and_ranges():
    raw = np.random.default_rng(0).integers(0, 256, (4, 64, 64, 3),
                                            dtype=np.uint8)
    x = normalize_uint8(jnp.asarray(raw))
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    assert center_crop(x, 32).shape == (4, 32, 32, 3)
    assert resize_down_pow2(x, 16).shape == (4, 16, 16, 3)
    rc = random_crop(x, 48, jax.random.PRNGKey(0))
    assert rc.shape == (4, 48, 48, 3)
    out = standard_pipeline(jnp.asarray(raw), jax.random.PRNGKey(1),
                            crop=48, out_size=24, flip=True)
    assert out.shape == (4, 24, 24, 3)


def test_resize_pow2_mean_pool_exact():
    """2x mean-pool downsize equals the hand-computed block mean."""
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = resize_down_pow2(x, 2)
    want = np.array([[[2.5], [4.5]], [[10.5], [12.5]]], np.float32)[None]
    np.testing.assert_allclose(np.asarray(y), want)
