"""Immutable configuration tree for the TPU-native AMC framework.

Covers the same knobs as the reference config
(``/root/reference/src/amcpy/config.py:15-186``: paths, signal metadata,
feature selection, training hyperparameters) plus TPU-specific policy that
has no reference counterpart: device-mesh layout, compute dtype, and the
explicit feature-id -> column map that the reference lacked (it silently
used 1-based feature ids as 0-based column indices, see SURVEY.md section 3
defect 2 — here the mapping is explicit and documented).

Everything is a frozen dataclass: no global mutable state, and a config is
hashable so it can be closed over by ``jax.jit``-ed functions as a static.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping


# ---------------------------------------------------------------------------
# Paths
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Paths:
    """Filesystem layout. Directory names match the reference on-disk layout
    (``config.py:34-43`` of the reference) so `.mat` artifacts interop with
    the MATLAB analysis scripts downstream."""

    root: str = field(default_factory=os.getcwd)

    @property
    def root_path(self) -> Path:
        return Path(self.root)

    @property
    def mat_data(self) -> Path:
        return self.root_path / "mat-data"

    @property
    def calculated_features(self) -> Path:
        return self.root_path / "calculated-features"

    @property
    def arm_data(self) -> Path:
        return self.root_path / "arm-data"

    @property
    def trained_ann(self) -> Path:
        return self.root_path / "ann"

    @property
    def figures(self) -> Path:
        return self.root_path / "figures"

    @property
    def feature_figures(self) -> Path:
        return self.root_path / "figures" / "features"

    @property
    def metrics(self) -> Path:
        return self.root_path / "metrics"

    mat_filename: str = "all_modulations.mat"

    def ensure_dirs(self) -> None:
        for p in (
            self.mat_data,
            self.calculated_features,
            self.arm_data,
            self.trained_ann,
            self.figures,
            self.feature_figures,
            self.metrics,
        ):
            p.mkdir(parents=True, exist_ok=True)


# ---------------------------------------------------------------------------
# Signals
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SignalConfig:
    """Modulation metadata. Mirrors the reference signal set
    (``config.py:60-110``): 5 modulations + WGN, 16 SNR levels (-10..20 dB
    in 2 dB steps), 1000 frames x 2048 complex samples each."""

    modulations: tuple[str, ...] = ("BPSK", "QPSK", "8PSK", "16QAM", "64QAM")
    modulations_with_noise: tuple[str, ...] = (
        "BPSK",
        "QPSK",
        "8PSK",
        "16QAM",
        "64QAM",
        "WGN",
    )
    labels: tuple[int, ...] = (0, 1, 2, 3, 4, 5)

    # SNR levels in dB, index == SNR level id used everywhere.
    snr_db: tuple[int, ...] = tuple(range(-10, 22, 2))  # 16 levels

    frame_size: int = 2048
    num_frames: int = 1000

    # .mat variable name per modulation (byte-compatible with the reference
    # artifact layout, ``config.py:101-110``).
    @property
    def mat_info(self) -> dict[str, str]:
        return {
            "BPSK": "signal_bpsk",
            "QPSK": "signal_qpsk",
            "8PSK": "signal_8psk",
            "16QAM": "signal_qam16",
            "64QAM": "signal_qam64",
            "WGN": "signal_noise",
        }

    @property
    def num_snr(self) -> int:
        return len(self.snr_db)

    def snr_label(self, snr_idx: int) -> str:
        return str(self.snr_db[snr_idx])


# ---------------------------------------------------------------------------
# Features
# ---------------------------------------------------------------------------

#: Display names (mathtext) for all 18 features, keyed by 1-based feature id.
FEATURE_NAMES: dict[int, str] = {
    1: r"$\gamma_{max}$",
    2: r"$\sigma_{ap}$",
    3: r"$\sigma_{dp}$",
    4: r"$\sigma_{aa}$",
    5: r"$\sigma_{af}$",
    6: r"$X$",
    7: r"$X_2$",
    8: r"$\mu_{42}^{a}$",
    9: r"$\mu_{42}^{f}$",
    10: r"$C_{20}$",
    11: r"$C_{21}$",
    12: r"$C_{40}$",
    13: r"$C_{41}$",
    14: r"$C_{42}$",
    15: r"$C_{60}$",
    16: r"$C_{61}$",
    17: r"$C_{62}$",
    18: r"$C_{63}$",
}


@dataclass(frozen=True)
class FeatureConfig:
    """Feature selection with an EXPLICIT id -> column map.

    Column ``j`` of an extracted feature matrix holds feature id ``j + 1``.
    ``used`` holds 1-based feature IDS. The reference instead indexed
    columns directly with the ids (off-by-one, SURVEY.md section 3 defect 2),
    so it actually consumed features 3,5,7,9,13,15 while labeling them
    2,4,6,8,12,14. Set ``reference_parity_columns=True`` to reproduce the
    reference's *actual* column choice for A/B comparisons.
    """

    all_features: tuple[int, ...] = tuple(range(1, 19))
    used: tuple[int, ...] = (2, 4, 6, 8, 12, 14)
    reference_parity_columns: bool = False

    @property
    def used_columns(self) -> tuple[int, ...]:
        """0-based column indices into the (frames, 18) feature matrix."""
        if self.reference_parity_columns:
            # the reference's off-by-one behaviour: ids used as columns
            return tuple(self.used)
        return tuple(f - 1 for f in self.used)

    @property
    def used_names(self) -> list[str]:
        if self.reference_parity_columns:
            return [FEATURE_NAMES[c + 1] for c in self.used_columns]
        return [FEATURE_NAMES[f] for f in self.used]

    @property
    def num_used(self) -> int:
        return len(self.used)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainingConfig:
    """NN training hyperparameters (defaults match the reference W&B-tuned
    values, ``config.py:151-176``)."""

    training_snr: tuple[int, ...] = (10, 11, 12, 13, 14, 15)  # 10..20 dB
    all_snr: tuple[int, ...] = tuple(range(16))

    test_size: float = 0.2
    seed: int = 42

    activation: str = "relu"
    batch_size: int = 128
    dropout: float = 0.4
    epochs: int = 21
    learning_rate: float = 0.001418378071933655
    optimizer: str = "rmsprop"
    hidden_sizes: tuple[int, ...] = (26, 29, 30)


# ---------------------------------------------------------------------------
# Compute / mesh policy (TPU-specific; no reference counterpart)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ComputeConfig:
    """Device-mesh layout and numeric policy.

    ``data_axis`` shards the frame batch (modulation x SNR x frame); the
    optional ``seq_axis`` shards the sample dimension of very long frames
    (sequence parallelism for extraction: shard-local partial moments +
    psum, 1-sample halo exchange for the instantaneous-frequency diff).
    """

    data_axis: str = "data"
    seq_axis: str = "seq"
    mesh_shape: tuple[int, ...] = ()  # () => all visible devices on data axis
    # float32 is TPU-native; float64 available for CPU oracle runs.
    compute_dtype: str = "float32"
    # Per-frame magnitude normalization before moment accumulation: exact
    # (features are homogeneous in scale) and keeps x^6 terms well inside
    # float32 range.
    normalize_scale: bool = True
    # gamma_max spectral kernel: "matmul" = four-step DFT on the MXU
    # (~2x faster than XLA's FFT on TPU, bench-verified), "fft" = XLA FFT.
    gmax_mode: str = "matmul"
    # Feature-extraction kernel: "xla" = fused XLA program (default),
    # "fused" = full-fusion Pallas/Mosaic kernel (stats + in-kernel MXU
    # matmul-DFT in one VMEM pass; fastest on TPU, bench r3; falls back to
    # "xla" for frame sizes with no N1 x N2 factorization), "pallas" =
    # the round-2 single-VMEM-pass kernel with an XLA spectral epilogue.
    # Ignored when the mesh has a seq axis > 1 (the sequence-parallel
    # shard_map kernel is used then). All are conformance-tested against
    # the same float64 oracle. "auto" (default) = "fused" on accelerator
    # backends with a probed fallback to "xla", plain "xla" on CPU.
    kernel: str = "auto"
    # Host->device wire codec for raw IQ frames (ops/wire.py): "int24"
    # ships 3 bytes/sample as block-floating-point integers dequantized
    # on device (25% fewer wire bytes), "int16" ships 2 bytes/sample,
    # "f32" ships raw planes. "auto" = "int24" on TPU backends (where
    # the tunneled wire is the end-to-end bottleneck), "f32" elsewhere.
    # Applies to the fused-kernel extraction path. Gating evidence
    # (scripts/wire_gate.py over the FULL 96k-frame dataset vs the
    # float64 oracle, metrics/wire_gate.json): int24 worst-case consumes
    # ~0.84 of the reference-parity tolerance budget — dominated by
    # sigma_dp, the phase of near-zero samples, whose sensitivity tail
    # grows with frame count — vs ~0.12 for the f32 control; still 0
    # frames outside tolerance at full scale (`amc parity`). int16
    # breaks the budget (2-8x, the committed negative arm).
    wire_format: str = "auto"


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    paths: Paths = field(default_factory=Paths)
    signals: SignalConfig = field(default_factory=SignalConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    compute: ComputeConfig = field(default_factory=ComputeConfig)

    # ------------------------------------------------------------------
    # Functional updates & (de)serialization
    # ------------------------------------------------------------------

    def replace(self, **kwargs: Any) -> "Config":
        """Nested functional update: ``cfg.replace(training={'epochs': 5})``
        or with ready dataclasses: ``cfg.replace(training=new_training)``.

        Unlike the reference CLI (whose --epochs/--lr/... flags never reached
        training, SURVEY.md section 3 defect 6), this is the single override
        path used by the CLI so every flag actually takes effect.
        """
        updates: dict[str, Any] = {}
        for key, value in kwargs.items():
            current = getattr(self, key)
            if isinstance(value, Mapping):
                value = dataclasses.replace(current, **dict(value))
            updates[key] = value
        return dataclasses.replace(self, **updates)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        def _mk(tp, sub):
            if sub is None:
                return tp()
            fields = {f.name: f.type for f in dataclasses.fields(tp)}
            clean = {}
            for k, v in sub.items():
                if k not in fields:
                    continue
                if isinstance(v, list):
                    v = tuple(v)
                clean[k] = v
            return tp(**clean)

        return cls(
            paths=_mk(Paths, d.get("paths")),
            signals=_mk(SignalConfig, d.get("signals")),
            features=_mk(FeatureConfig, d.get("features")),
            training=_mk(TrainingConfig, d.get("training")),
            compute=_mk(ComputeConfig, d.get("compute")),
        )

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Config":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})
