from .metrics import (
    clip_image_features,
    clip_score,
    clip_score_images,
    feature_stats,
    features_over_batches,
    fid_from_features,
    frechet_distance,
)

__all__ = [
    "clip_image_features",
    "clip_score",
    "clip_score_images",
    "feature_stats",
    "features_over_batches",
    "fid_from_features",
    "frechet_distance",
]
