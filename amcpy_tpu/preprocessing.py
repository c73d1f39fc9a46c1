"""Feature-matrix assembly, standardization, and train/test split.

JAX-native replacement for the reference preprocessing
(``/root/reference/src/amcpy/preprocessing.py:13-75``), with its two latent
defects fixed by design (SURVEY.md section 3):

* the feature-id -> column mapping is explicit (``FeatureConfig.used_columns``)
  instead of 1-based ids silently used as 0-based indices;
* assembly is always ``(frames, features)`` orientation — the reference's
  advanced-indexing transpose bug cannot occur.

The standardizer matches sklearn's ``StandardScaler`` numerics (biased
variance) but is a plain pytree that is (a) persisted with the model
checkpoint — the reference never saved it and silently refit at eval — and
(b) computable on sharded device arrays, where ``jnp.mean`` over a
data-sharded batch lowers to shard-local sums + ``psum``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from amcpy_tpu.config import Config

__all__ = [
    "Standardizer",
    "build_dataset",
    "build_raw_dataset",
    "stratified_split",
    "stratified_split_indices",
    "train_frame_mask",
    "preprocess",
    "preprocess_raw",
]


@dataclass
class Standardizer:
    """z-score transform with sklearn-compatible (biased) statistics."""

    mean: np.ndarray
    std: np.ndarray

    @classmethod
    def fit(cls, x) -> "Standardizer":
        x = jnp.asarray(x)
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)  # biased, like sklearn
        std = jnp.sqrt(var)
        std = jnp.where(std == 0, 1.0, std)  # constant features pass through
        return cls(mean=np.asarray(mean), std=np.asarray(std))

    def transform(self, x):
        if isinstance(x, np.ndarray):
            return (x - self.mean) / self.std
        return (jnp.asarray(x) - self.mean) / self.std

    def to_dict(self) -> dict:
        return {"mean": self.mean.tolist(), "std": self.std.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "Standardizer":
        return cls(
            mean=np.asarray(d["mean"], np.float32),
            std=np.asarray(d["std"], np.float32),
        )


def build_dataset(
    features: dict[str, np.ndarray],
    cfg: Config,
    mode: str = "training",
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble the ``(samples, used_features)`` matrix + integer labels.

    ``features`` maps modulation name -> ``(num_snr, num_frames, 18)``.
    ``mode="training"`` restricts to the high-SNR levels
    (``cfg.training.training_snr``); ``"test"`` uses all SNR levels —
    same semantics as the reference CLI modes (``preprocessing.py:37``).
    Row order: (modulation, snr, frame).
    """
    t = cfg.training
    snr_axis = t.training_snr if mode == "training" else t.all_snr
    cols = list(cfg.features.used_columns)
    xs, ys = [], []
    for mod_idx, mod in enumerate(cfg.signals.modulations_with_noise):
        feats = features[mod]  # (S, F, 18)
        sel = feats[list(snr_axis)][:, :, cols]  # (s, F, used)
        xs.append(sel.reshape(-1, len(cols)))
        ys.append(
            np.full(sel.shape[0] * sel.shape[1], cfg.signals.labels[mod_idx],
                    dtype=np.int32)
        )
    return (
        np.concatenate(xs).astype(np.float32),
        np.concatenate(ys),
    )


def build_raw_dataset(
    data: dict[str, np.ndarray],
    cfg: Config,
    mode: str = "training",
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble the raw-IQ batch ``(samples, 2, frame_size)`` + labels.

    ``data`` maps modulation name -> ``(num_snr, num_frames, frame_size)``
    complex frames (the ``all_modulations.mat`` layout the feature pipeline
    reads). Output is planar float32 — the canonical device interface —
    feeding the :class:`~amcpy_tpu.models.cnn.IQConvNet` raw-IQ family. SNR
    selection semantics match :func:`build_dataset`. No standardizer: the
    CNN RMS-normalizes per frame inside the model.
    """
    from amcpy_tpu.ops.features import to_planar

    t = cfg.training
    snr_axis = t.training_snr if mode == "training" else t.all_snr
    xs, ys = [], []
    for mod_idx, mod in enumerate(cfg.signals.modulations_with_noise):
        frames = data[mod][list(snr_axis)]  # (s, F, N) complex
        n = frames.shape[0] * frames.shape[1]
        xs.append(
            to_planar(frames.reshape(n, frames.shape[2])).astype(np.float32)
        )
        ys.append(np.full(n, cfg.signals.labels[mod_idx], dtype=np.int32))
    return np.concatenate(xs), np.concatenate(ys)


def stratified_split_indices(
    y: np.ndarray,
    test_size: float,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stratified split as ``(train_idx, test_idx)`` row
    indices into the assembled dataset.

    The indices are a pure function of ``(y, test_size, seed)``, so any
    later consumer (``amc eval``, the parity harness, the CNN-vs-MLP
    comparison) can reproduce the EXACT held-out set of a checkpoint from
    its recorded seed — the reference could not (its eval path re-split
    nothing and simply reused all data, ``main.py:129-137``).
    """
    rng = np.random.default_rng(seed)
    test_idx: list[np.ndarray] = []
    train_idx: list[np.ndarray] = []
    for cls in np.unique(y):
        idx = np.nonzero(y == cls)[0]
        idx = rng.permutation(idx)
        n_test = int(round(len(idx) * test_size))
        test_idx.append(idx[:n_test])
        train_idx.append(idx[n_test:])
    tr = rng.permutation(np.concatenate(train_idx))
    te = rng.permutation(np.concatenate(test_idx))
    return tr, te


def stratified_split(
    x: np.ndarray,
    y: np.ndarray,
    test_size: float,
    seed: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic stratified train/test split.

    Matches the reference's ``train_test_split(stratify=y, random_state=42)``
    semantics — per-class proportions preserved exactly — though not its
    exact index permutation (accuracy parity, not index parity, is the bar;
    documented in SURVEY.md section 7 step 6).
    """
    tr, te = stratified_split_indices(y, test_size, seed)
    return x[tr], x[te], y[tr], y[te]


def train_frame_mask(
    cfg: Config, train_idx: np.ndarray, mode: str = "training"
) -> np.ndarray:
    """Map train-split row indices back to a ``(mods, num_snr, num_frames)``
    boolean mask of frames seen in training.

    Row order of :func:`build_dataset` / :func:`build_raw_dataset` is
    (modulation, selected-snr, frame), so a flat row index decomposes
    exactly. Used to restrict per-SNR evaluation to held-out frames
    (frames at non-training SNR levels were never trained on and stay
    unmasked).
    """
    t = cfg.training
    snr_sel = list(t.training_snr if mode == "training" else t.all_snr)
    n_mods = len(cfg.signals.modulations_with_noise)
    n_f = cfg.signals.num_frames
    mask = np.zeros((n_mods, cfg.signals.num_snr, n_f), dtype=bool)
    idx = np.asarray(train_idx)
    frame = idx % n_f
    block = idx // n_f
    snr_i = np.asarray(snr_sel)[block % len(snr_sel)]
    mod_i = block // len(snr_sel)
    mask[mod_i, snr_i, frame] = True
    return mask


def preprocess(
    features: dict[str, np.ndarray],
    cfg: Config,
    mode: str = "training",
    *,
    return_indices: bool = False,
):
    """Full preprocessing: assemble -> standardize -> stratified split.

    Returns ``x_train, x_test, y_train, y_test, standardizer`` (mirroring
    the reference API shape, ``preprocessing.py:13-75``); with
    ``return_indices=True`` additionally ``(train_idx, test_idx)`` row
    indices into the assembled dataset (for held-out evaluation masks).
    """
    x, y = build_dataset(features, cfg, mode)
    scaler = Standardizer.fit(x)
    xs = scaler.transform(x).astype(np.float32)
    tr, te = stratified_split_indices(y, cfg.training.test_size,
                                      cfg.training.seed)
    out = (xs[tr], xs[te], y[tr], y[te], scaler)
    return out + ((tr, te),) if return_indices else out


def preprocess_raw(
    data: dict[str, np.ndarray],
    cfg: Config,
    mode: str = "training",
    *,
    return_indices: bool = False,
):
    """Raw-IQ preprocessing: assemble planar frames -> stratified split.

    Same split determinism as :func:`preprocess`; no standardization stage
    (the CNN family is per-frame scale-invariant by construction).
    """
    x, y = build_raw_dataset(data, cfg, mode)
    tr, te = stratified_split_indices(y, cfg.training.test_size,
                                      cfg.training.seed)
    out = (x[tr], x[te], y[tr], y[te])
    return out + ((tr, te),) if return_indices else out
