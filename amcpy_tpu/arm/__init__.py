from amcpy_tpu.arm.analysis import (
    bin_predictions,
    per_modulation_accuracy,
    per_snr_counts,
    plot_embedded_accuracy,
)

__all__ = [
    "per_modulation_accuracy",
    "per_snr_counts",
    "bin_predictions",
    "plot_embedded_accuracy",
]
