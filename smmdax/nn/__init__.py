"""Network architectures: DCGAN and ResNet generator/critic pairs.

Covers SURVEY.md components #6 (core/architecture.py), #7
(core/resnet.py) and #8 (core/ops.py + spectral norm) of the reference,
re-designed as flax.linen modules with spectral-norm power iteration
carried as explicit collection state ('spectral') so it jits cleanly
and replicates exactly under data parallelism.
"""

from smmdax.nn.layers import SNDense, SNConv, power_iteration  # noqa: F401
from smmdax.nn.dcgan import DCGANGenerator, DCGANDiscriminator  # noqa: F401
from smmdax.nn.resnet import ResNetGenerator, ResNetDiscriminator  # noqa: F401
from smmdax.nn.registry import build_models  # noqa: F401
