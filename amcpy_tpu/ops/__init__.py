from amcpy_tpu.ops.features import NUM_FEATURES, extract_features

__all__ = ["extract_features", "NUM_FEATURES"]
