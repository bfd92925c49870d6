"""Toy visualization: witness function closed form + frame rendering."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmdax.configs import Config
from smmdax.viz import assemble_toy_animation, plot_toy_frame, witness_fn


def test_witness_sign_structure():
    """With a linear critic on 1-D data, the witness must be positive
    near the fake mode and negative near the real mode."""
    cfg = Config(dataset="gaussian_mix", architecture="mlp",
                 kernel="gaussian", rbf_sigmas=(0.25,))
    w = jnp.ones((1, 4))
    critic = lambda x: x.reshape(x.shape[0], -1) @ w
    rng = np.random.default_rng(0)
    real = rng.normal(-0.5, 0.05, (500, 1)).astype(np.float32)
    fake = rng.normal(0.5, 0.05, (500, 1)).astype(np.float32)
    grid = np.array([[-0.5], [0.5]], np.float32)
    f_real = np.asarray(critic(jnp.asarray(real)))
    f_fake = np.asarray(critic(jnp.asarray(fake)))
    wv = witness_fn(cfg, critic, grid, f_real, f_fake)
    assert wv[0] < 0 < wv[1]          # negative at real mode, positive at fake


def test_plot_toy_frame_writes_png(tmp_path):
    cfg = Config(dataset="gaussian_mix", architecture="mlp")
    w = jnp.ones((1, 4)) * 0.5
    critic = lambda x: x.reshape(x.shape[0], -1) @ w
    rng = np.random.default_rng(1)
    real = rng.normal(0, 0.3, (256, 1)).astype(np.float32)
    fake = rng.normal(0.2, 0.3, (256, 1)).astype(np.float32)
    path = plot_toy_frame(cfg, critic, real, fake, step=7,
                          out_dir=str(tmp_path))
    if path is None:
        pytest.skip("matplotlib unavailable")
    assert os.path.exists(path) and path.endswith("toy_0000007.png")


def test_assemble_toy_animation(tmp_path):
    """Frames -> animated GIF (the reference's matplotlib animation as
    a file artifact, SURVEY.md §3.5)."""
    from PIL import Image
    cfg = Config(dataset="gaussian_mix", architecture="mlp")
    w = jnp.ones((1, 4)) * 0.5
    critic = lambda x: x.reshape(x.shape[0], -1) @ w
    rng = np.random.default_rng(2)
    # one frame only: not enough for an animation
    real = rng.normal(0, 0.3, (128, 1)).astype(np.float32)
    p = plot_toy_frame(cfg, critic, real, real, step=0, out_dir=str(tmp_path))
    if p is None:
        pytest.skip("matplotlib unavailable")
    assert assemble_toy_animation(str(tmp_path)) is None
    for step in (1, 2):
        fake = rng.normal(0.5 - 0.2 * step, 0.3, (128, 1)).astype(np.float32)
        plot_toy_frame(cfg, critic, real, fake, step=step,
                       out_dir=str(tmp_path))
    gif = assemble_toy_animation(str(tmp_path))
    assert gif is not None and gif.endswith("toy_animation.gif")
    with Image.open(gif) as im:
        assert im.is_animated and im.n_frames == 3
    # a run that never wrote a frame (dir never created) must not crash
    assert assemble_toy_animation(str(tmp_path / "never_created")) is None
