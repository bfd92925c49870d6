"""Architecture registry: config -> (generator, discriminator) modules.

Mirrors the reference's builder dispatch (SURVEY.md component #6) over
the [SPEC] arch flag set {dcgan, resnet}.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from smmdax.configs import Config
from smmdax.nn.dcgan import DCGANDiscriminator, DCGANGenerator
from smmdax.nn.resnet import ResNetDiscriminator, ResNetGenerator


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def build_models(cfg: Config) -> Tuple[nn.Module, nn.Module]:
    if cfg.architecture == "mlp" or cfg.dataset == "gaussian_mix":
        from smmdax.nn.mlp import MLPDiscriminator, MLPGenerator
        gen = MLPGenerator(out_dim=cfg.toy_dim, z_dim=cfg.z_dim)
        disc = MLPDiscriminator(dof_dim=cfg.dof_dim, use_sn=cfg.with_sn,
                                sn_iters=cfg.sn_iters)
        return gen, disc
    dt = _dtype(cfg)
    if cfg.architecture == "dcgan":
        gen = DCGANGenerator(output_size=cfg.output_size, c_dim=cfg.c_dim,
                             gf_dim=cfg.gf_dim, z_dim=cfg.z_dim, dtype=dt)
        disc = DCGANDiscriminator(output_size=cfg.output_size, df_dim=cfg.df_dim,
                                  dof_dim=cfg.dof_dim, use_sn=cfg.with_sn,
                                  sn_iters=cfg.sn_iters, dtype=dt)
    elif cfg.architecture == "resnet":
        gen = ResNetGenerator(output_size=cfg.output_size, c_dim=cfg.c_dim,
                              gf_dim=cfg.gf_dim, z_dim=cfg.z_dim, dtype=dt)
        disc = ResNetDiscriminator(output_size=cfg.output_size, df_dim=cfg.df_dim,
                                   dof_dim=cfg.dof_dim, use_sn=cfg.with_sn,
                                   sn_iters=cfg.sn_iters, dtype=dt)
    else:
        raise ValueError(f"unknown architecture {cfg.architecture!r}")
    return gen, disc
