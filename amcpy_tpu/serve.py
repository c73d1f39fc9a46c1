"""Serving: end-to-end raw-IQ -> modulation-label inference.

The reference had no serving path — classification outside training
happened only on the ARM firmware. This module packages the full chain
(fused feature extraction -> persisted standardizer -> classifier) into a
single jitted device program for production/streaming use:

    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    labels = pipe.predict(frames)            # (B, N) complex or (B, 2, N)
    probs = pipe.predict_proba(frames)
    pipe.classify_stream("capture.bin")      # GNU Radio complex64 capture

One device dispatch per batch; frames never round-trip between stages.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amcpy_tpu.config import Config
from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.ops.features import extract_features_planar
from amcpy_tpu.preprocessing import Standardizer

__all__ = ["AMCPipeline"]


class AMCPipeline:
    """Fused extract+standardize+classify inference pipeline."""

    def __init__(
        self,
        model: AMCClassifier,
        params,
        batch_stats,
        scaler: Standardizer,
        cfg: Config,
    ):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.scaler = scaler
        self.cfg = cfg
        self._cols = jnp.asarray(list(cfg.features.used_columns))
        self._mean = jnp.asarray(scaler.mean, jnp.float32)
        self._std = jnp.asarray(scaler.std, jnp.float32)

        @jax.jit
        def _logits(iq, params, batch_stats, mean, std):
            feats = extract_features_planar(
                iq, gmax_mode=cfg.compute.gmax_mode
            )
            x = (feats[:, self._cols] - mean) / std
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )

        self._logits_fn = _logits

    @classmethod
    def from_checkpoint(
        cls, cfg: Config, model_id: str | None = None
    ) -> "AMCPipeline":
        from amcpy_tpu.train.checkpoint import load_checkpoint, resolve_model_id

        model_id = resolve_model_id(cfg, model_id)
        model, state, scaler, _ = load_checkpoint(cfg, model_id)
        return cls(model, state.params, state.batch_stats, scaler, cfg)

    # ------------------------------------------------------------------

    def _to_device_planar(self, frames: np.ndarray) -> jax.Array:
        frames = np.asarray(frames)
        if np.iscomplexobj(frames):
            from amcpy_tpu.data.native_io import planarize

            frames = planarize(frames)
        if frames.ndim != 3 or frames.shape[-2] != 2:
            raise ValueError(
                f"expected (B, N) complex or (B, 2, N) planar, got "
                f"{frames.shape}"
            )
        return jnp.asarray(frames, jnp.float32)

    def logits(self, frames: np.ndarray) -> jax.Array:
        iq = self._to_device_planar(frames)
        return self._logits_fn(
            iq, self.params, self.batch_stats, self._mean, self._std
        )

    def predict(self, frames: np.ndarray) -> np.ndarray:
        """Predicted class ids, one per frame."""
        return np.asarray(jnp.argmax(self.logits(frames), axis=-1))

    def predict_proba(self, frames: np.ndarray) -> np.ndarray:
        return np.asarray(jax.nn.softmax(self.logits(frames), axis=-1))

    def predict_names(self, frames: np.ndarray) -> list[str]:
        mods = self.cfg.signals.modulations_with_noise
        return [mods[k] for k in self.predict(frames)]

    # ------------------------------------------------------------------

    def classify_stream(
        self,
        path: str | Path,
        *,
        frame_size: int | None = None,
        skip: int = 2400,
        batch_size: int = 4096,
    ) -> np.ndarray:
        """Classify a GNU Radio complex64 capture file; returns class ids
        per frame (native framer when available)."""
        from amcpy_tpu.data.native_io import read_stream_frames

        frame_size = frame_size or self.cfg.signals.frame_size
        planar = read_stream_frames(path, frame_size, skip=skip)
        out = np.empty(planar.shape[0], dtype=np.int64)
        for start in range(0, planar.shape[0], batch_size):
            chunk = planar[start : start + batch_size]
            out[start : start + len(chunk)] = self.predict(chunk)
        return out
