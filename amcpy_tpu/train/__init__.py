from amcpy_tpu.train.checkpoint import (
    load_checkpoint,
    resolve_model_id,
    save_checkpoint,
)
from amcpy_tpu.train.evaluate import confusion_counts, evaluate_by_snr
from amcpy_tpu.train.training import TrainState, accuracy, predict_logits, train

__all__ = [
    "train",
    "TrainState",
    "accuracy",
    "predict_logits",
    "save_checkpoint",
    "load_checkpoint",
    "resolve_model_id",
    "evaluate_by_snr",
    "confusion_counts",
]
