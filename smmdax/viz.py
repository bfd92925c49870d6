"""GaussianMix toy visualization (SURVEY.md §3.5): histogram of real
vs generated samples + the critic witness function — the reference's
matplotlib animation, emitted as per-interval PNG frames (an animation
without a display server)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smmdax.configs import Config
from smmdax.kernels import kernel_cross

Array = np.ndarray


def witness_fn(cfg: Config, critic, grid: Array, f_real: Array,
               f_fake: Array) -> Array:
    """w(x) = E_fake k(phi(x), phi(fake)) - E_real k(phi(x), phi(real))."""
    fx = critic(jnp.asarray(grid))
    # add_dot threaded through so the plotted witness is exactly the
    # one the critic trains on (mix_rq_dot variant included)
    k_fake = kernel_cross(cfg.kernel, fx, jnp.asarray(f_fake),
                          rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                          add_dot=cfg.kernel_add_dot)
    k_real = kernel_cross(cfg.kernel, fx, jnp.asarray(f_real),
                          rbf_sigmas=cfg.rbf_sigmas, rq_alphas=cfg.rq_alphas,
                          add_dot=cfg.kernel_add_dot)
    return np.asarray(jnp.mean(k_fake, axis=1) - jnp.mean(k_real, axis=1))


def plot_toy_frame(cfg: Config, critic, real: Array, fake: Array,
                   step: int, out_dir: str,
                   lo: float = -1.3, hi: float = 1.3) -> Optional[str]:
    """One frame: sample histograms + witness curve.  Returns the path
    (or None when matplotlib is unavailable)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    real = np.asarray(real).reshape(len(real), -1)
    fake = np.asarray(fake).reshape(len(fake), -1)
    grid = np.linspace(lo, hi, 301, dtype=np.float32)[:, None]
    w = witness_fn(cfg, critic, grid,
                   np.asarray(critic(jnp.asarray(real))),
                   np.asarray(critic(jnp.asarray(fake))))

    fig, ax1 = plt.subplots(figsize=(7, 4))
    ax1.hist(real[:, 0], bins=60, range=(lo, hi), density=True, alpha=0.45,
             label="real")
    ax1.hist(fake[:, 0], bins=60, range=(lo, hi), density=True, alpha=0.45,
             label="generated")
    ax1.set_ylabel("density")
    ax1.legend(loc="upper left")
    ax2 = ax1.twinx()
    ax2.plot(grid[:, 0], w, lw=2, color="black", label="witness")
    ax2.set_ylabel("witness w(x)")
    ax2.legend(loc="upper right")
    ax1.set_title(f"{cfg.run_name()} — step {step}")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"toy_{step:07d}.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def assemble_toy_animation(out_dir: str,
                           duration_ms: int = 200) -> Optional[str]:
    """Stitch the per-interval toy frames into ``toy_animation.gif`` —
    the file-artifact equivalent of the reference's live matplotlib
    animation (SURVEY.md §3.5).  Returns the GIF path, or None when
    fewer than two frames exist."""
    try:
        from PIL import Image
    except Exception:
        return None
    if not os.path.isdir(out_dir):     # no frame was ever written (short
        return None                    # run / matplotlib unavailable)
    frames = sorted(f for f in os.listdir(out_dir)
                    if f.startswith("toy_") and f.endswith(".png"))
    if len(frames) < 2:
        return None
    imgs = [Image.open(os.path.join(out_dir, f)).convert("P")
            for f in frames]
    path = os.path.join(out_dir, "toy_animation.gif")
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)
    for im in imgs:
        im.close()
    return path
