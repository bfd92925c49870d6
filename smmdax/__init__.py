"""smmdax — a TPU-native Scaled-MMD-GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference repo ``playHing/Scaled-MMD-GAN`` (TF1, single GPU; see
``SURVEY.md`` at the repo root for the full component inventory this
framework covers).  Nothing here is a port: the compute path is built
for the TPU compilation model (static shapes, fused jitted steps,
``jax.sharding`` data parallelism with global-batch MMD statistics over
ICI, Pallas kernels for the pairwise-kernel hot path).

Public surface mirrors the reference trainer:
  losses  : mmd | smmd | sn-smmd | wgan-gp  (+ tmmd ratio objective)
  kernels : gaussian | rq  (+ dot, distance/energy for completeness)
  archs   : dcgan | resnet
  datasets: cifar10 (32x32) | celeba (160x160) | imagenet64 | gaussian_mix
  eval    : FID / KID (subset-averaged polynomial MMD) / IS
"""

__version__ = "0.1.0"

from smmdax.configs import Config  # noqa: F401
