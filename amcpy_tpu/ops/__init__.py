from amcpy_tpu.ops.features import (
    NUM_FEATURES,
    extract_features,
    extract_features_planar,
    to_planar,
)

__all__ = [
    "extract_features",
    "extract_features_planar",
    "to_planar",
    "NUM_FEATURES",
]
