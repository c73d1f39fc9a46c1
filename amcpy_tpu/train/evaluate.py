"""Evaluation: per-SNR accuracy matrix and confusion matrix.

Replaces ``evaluate_by_snr`` / ``confusion_matrix`` of the reference
(``/root/reference/src/amcpy/nn_model.py:227-281``) with batched device
evaluation: all (mod, snr) blocks are evaluated in ONE device call on a
``(mods*snr*frames, features)`` batch instead of 96 sequential host
round-trips. Writes the same ``{id}_figure_data.mat`` artifact.
"""

from __future__ import annotations

import numpy as np
import scipy.io

import jax
import jax.numpy as jnp

from amcpy_tpu.config import Config
from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.preprocessing import Standardizer
from amcpy_tpu.train.training import (
    TrainState,
    predict_logits,
    predict_logits_global,
)

__all__ = ["evaluate_by_snr", "confusion_counts", "save_figure_data"]


def _logits_np(model, state, x) -> np.ndarray:
    """Single- or multi-process logits as a host array. Multi-process runs
    must shard rows over the GLOBAL mesh and replicate the output — a
    plain local jit would mix host-local and global-mesh arrays."""
    if jax.process_count() > 1:
        return predict_logits_global(model, state, x)
    return np.asarray(
        predict_logits(model, state.params, state.batch_stats, jnp.asarray(x))
    )


def evaluate_by_snr(
    model: AMCClassifier,
    state: TrainState,
    scaler: Standardizer,
    features: dict[str, np.ndarray],
    cfg: Config,
) -> np.ndarray:
    """Accuracy per (modulation, SNR): ``(n_mods, n_snr)`` in [0, 1].

    ``features`` maps modulation -> ``(num_snr, num_frames, 18)`` matrices
    (the extraction artifacts). The scaler is the one persisted with the
    checkpoint — not refit (fixes reference defect 5).
    """
    s = cfg.signals
    cols = list(cfg.features.used_columns)
    mods = s.modulations_with_noise
    blocks = np.stack([features[m][:, :, cols] for m in mods])  # (M,S,F,U)
    m, n_snr, n_frames, u = blocks.shape
    x = scaler.transform(blocks.reshape(-1, u).astype(np.float32))
    logits = _logits_np(model, state, x)
    pred = np.argmax(logits, -1).reshape(m, n_snr, n_frames)
    true = np.asarray(cfg.signals.labels)[:, None, None]
    return (pred == true).mean(axis=-1)


def confusion_counts(
    model: AMCClassifier,
    state: TrainState,
    x: np.ndarray,
    y: np.ndarray,
    n_classes: int,
) -> np.ndarray:
    """Row-normalized confusion matrix (true x predicted), 2 decimals —
    matching the reference presentation (``nn_model.py:302-305``)."""
    logits = _logits_np(model, state, x)
    pred = np.argmax(logits, -1)
    cm = np.zeros((n_classes, n_classes), dtype=np.float64)
    np.add.at(cm, (np.asarray(y), pred), 1.0)
    return np.around(cm / np.maximum(cm.sum(axis=1, keepdims=True), 1), 2)


def save_figure_data(cfg: Config, model_id: str, acc: np.ndarray) -> None:
    cfg.paths.ensure_dirs()
    scipy.io.savemat(
        str(cfg.paths.figures / f"{model_id}_figure_data.mat"), {"acc": acc}
    )
