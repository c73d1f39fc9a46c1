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

__all__ = [
    "evaluate_by_snr",
    "evaluate_by_snr_raw",
    "confusion_counts",
    "save_figure_data",
]


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
    exclude_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Accuracy per (modulation, SNR): ``(n_mods, n_snr)`` in [0, 1].

    ``features`` maps modulation -> ``(num_snr, num_frames, 18)`` matrices
    (the extraction artifacts). The scaler is the one persisted with the
    checkpoint — not refit (fixes reference defect 5).

    ``exclude_mask`` — optional ``(n_mods, n_snr, n_frames)`` bool marking
    frames to EXCLUDE from the accuracy (e.g. the training split, from
    :func:`~amcpy_tpu.preprocessing.train_frame_mask`), so the curve is
    computed on held-out frames only. Default keeps reference semantics:
    all frames (``nn_model.py:245-259`` evaluated full 1000-frame blocks).
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
    return _masked_block_accuracy(pred == true, exclude_mask)


def _masked_block_accuracy(
    correct: np.ndarray, exclude_mask: np.ndarray | None
) -> np.ndarray:
    """Mean over the frame axis of ``(M, S, F)`` correctness, optionally
    restricted to frames NOT in ``exclude_mask``."""
    if exclude_mask is None:
        return correct.mean(axis=-1)
    keep = ~np.asarray(exclude_mask, dtype=bool)
    n = np.maximum(keep.sum(axis=-1), 1)
    return (correct & keep).sum(axis=-1) / n


def evaluate_by_snr_raw(
    model,
    state: TrainState,
    data: dict[str, np.ndarray],
    cfg: Config,
    chunk: int = 2048,
    exclude_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Per-(modulation, SNR) accuracy of a raw-IQ model (CNN family).

    ``data`` maps modulation -> ``(num_snr, num_frames, frame_size)``
    complex frames (the raw ``all_modulations.mat`` layout — no feature
    extraction stage). Frames stream to the device in fixed ``chunk``-row
    planar batches (the ragged tail is padded, so exactly one program is
    compiled) to bound HBM residency: the full default dataset is 1.6 GB
    planar, which has no reason to sit on device all at once.

    ``exclude_mask`` as in :func:`evaluate_by_snr` — restricts the curve
    to held-out frames.
    """
    from amcpy_tpu.ops.features import to_planar

    s = cfg.signals
    mods = s.modulations_with_noise
    correct = np.zeros((len(mods), s.num_snr, s.num_frames), dtype=bool)
    for mod_idx, mod in enumerate(mods):
        frames = np.asarray(data[mod])  # (S, F, N) complex
        n_snr, n_frames, n = frames.shape
        x = to_planar(frames.reshape(-1, n))  # (S*F, 2, N) f32
        pred = _predict_classes(model, state, x, chunk).reshape(
            n_snr, n_frames
        )
        correct[mod_idx] = pred == s.labels[mod_idx]
    return _masked_block_accuracy(correct, exclude_mask)


def _predict_classes(model, state, x: np.ndarray, chunk: int | None) -> np.ndarray:
    """argmax class per row; fixed-size padded chunks when ``chunk`` is set
    (one compiled program, bounded HBM residency for big raw-IQ batches)."""
    if chunk is None or x.shape[0] <= chunk:
        return np.argmax(_logits_np(model, state, x), -1)
    preds = []
    for start in range(0, x.shape[0], chunk):
        xb = x[start : start + chunk]
        rows = xb.shape[0]
        if rows < chunk:
            xb = np.concatenate(
                [xb, np.zeros((chunk - rows, *x.shape[1:]), x.dtype)]
            )
        preds.append(np.argmax(_logits_np(model, state, xb), -1)[:rows])
    return np.concatenate(preds)


def confusion_counts(
    model,
    state: TrainState,
    x: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    chunk: int | None = None,
) -> np.ndarray:
    """Row-normalized confusion matrix (true x predicted), 2 decimals —
    matching the reference presentation (``nn_model.py:302-305``)."""
    pred = _predict_classes(model, state, np.asarray(x), chunk)
    cm = np.zeros((n_classes, n_classes), dtype=np.float64)
    np.add.at(cm, (np.asarray(y), pred), 1.0)
    return np.around(cm / np.maximum(cm.sum(axis=1, keepdims=True), 1), 2)


def save_figure_data(cfg: Config, model_id: str, acc: np.ndarray) -> None:
    cfg.paths.ensure_dirs()
    scipy.io.savemat(
        str(cfg.paths.figures / f"{model_id}_figure_data.mat"), {"acc": acc}
    )
