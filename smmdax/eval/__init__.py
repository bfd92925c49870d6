"""Evaluation: FID / KID / Inception Score (SURVEY.md component #10,
the reference's compute_scores.py — this lineage is the canonical KID
implementation; KID = unbiased MMD^2 with the polynomial kernel
k(x,y) = (x.y/d + 1)^3 averaged over ~50 subsets of ~1000 samples).
"""

from smmdax.eval.scores import (  # noqa: F401
    frechet_distance,
    fid_from_features,
    polynomial_mmd,
    kid_from_features,
    inception_score,
    gaussian_stats,
    use_device_scoring,
)
from smmdax.eval.features import (  # noqa: F401
    FeatureExtractor,
    InceptionFeatures,
    RandomConvFeatures,
    extract_features,
    extract_with_probs,
    find_inception_weights,
    get_feature_extractor,
)
