from amcpy_tpu.ops.features import (
    NUM_FEATURES,
    extract_features,
    extract_features_planar,
    to_planar,
)
from amcpy_tpu.ops.fused import extract_features_fused, split_planes

__all__ = [
    "extract_features",
    "extract_features_planar",
    "extract_features_fused",
    "split_planes",
    "to_planar",
    "NUM_FEATURES",
]
