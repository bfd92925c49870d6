"""Input pipelines (SURVEY.md component #9, core/pipeline.py).

The reference's queue-runner threading becomes simple host-side numpy
iterators producing stacked macro-batches (one array per fused train
step), with decode/crop/resize/normalize done either at ingest or as
on-device jitted transforms (smmdax.data.transforms).  Real-dataset
loaders are asset-gated (no network in this environment — SURVEY.md §7
hard-part #5); procedural synthetic sources with matching shapes keep
every pipeline testable offline.
"""

from smmdax.data.pipeline import make_dataset, DataSource  # noqa: F401
from smmdax.data.synthetic import SyntheticImages, GaussianMix  # noqa: F401
