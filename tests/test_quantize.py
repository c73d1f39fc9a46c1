"""Q-format quantization tests: format selection, round-trip error bounds,
BN folding correctness, and quantized-vs-float agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amcpy_tpu.config import Config
from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.ops.quantize import (
    Q_FORMATS,
    dense_layers,
    dequantize_array,
    find_best_q_format,
    fold_batchnorm,
    q_range,
    quantize_array,
    quantize_model,
    quantized_predict,
)


def test_q_format_table():
    assert Q_FORMATS[0] == "Q0.15" and Q_FORMATS[-1] == "Q6.9"
    lo, hi = q_range("Q1.14")
    assert lo == -1.0 and hi == pytest.approx(1.0 - 2**-14)


@pytest.mark.parametrize(
    "lo,hi,expect",
    [
        (-0.3, 0.4, "Q0.15"),
        (-1.0, 0.9, "Q1.14"),
        (-3.5, 2.0, "Q3.12"),
        (-100.0, 100.0, "Q6.9"),  # fallback
    ],
)
def test_find_best_q_format(lo, hi, expect):
    assert find_best_q_format(lo, hi) == expect


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.uniform(-0.9, 0.9, size=(64,)).astype(np.float32)
    fmt = find_best_q_format(float(w.min()), float(w.max()))
    deq = dequantize_array(quantize_array(w, fmt), fmt)
    n = int(fmt.split(".")[1])
    assert np.max(np.abs(w - deq)) <= 2 ** (-n) / 2 + 1e-9


@pytest.fixture()
def trained_like_state():
    """A randomly-initialized model stands in for a trained one."""
    model = AMCClassifier(n_classes=6, hidden_sizes=(26, 29, 30))
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 6), jnp.float32), train=False
    )
    # give batch stats non-trivial values
    bs = jax.tree.map(
        lambda v: v + 0.3 * np.abs(np.random.default_rng(1).standard_normal(v.shape)).astype(v.dtype),
        variables["batch_stats"],
    )
    return model, variables["params"], bs


def test_fold_batchnorm_equivalence(trained_like_state):
    """Folded dense chain == model inference forward (dropout off)."""
    model, params, batch_stats = trained_like_state
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 6)).astype(np.float32)
    want = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    )
    h = x.copy()
    layers = fold_batchnorm(params, batch_stats)
    for li, (k, b) in enumerate(layers):
        h = h @ k + b
        if li < len(layers) - 1:
            h = np.maximum(h, 0.0)
    np.testing.assert_allclose(h, want, rtol=1e-4, atol=1e-5)


def test_quantize_model_artifact(tmp_path, trained_like_state):
    model, params, batch_stats = trained_like_state
    cfg = Config().replace(paths={"root": str(tmp_path)})
    rng = np.random.default_rng(3)
    sample = rng.standard_normal((100, 6)).astype(np.float32)
    save_dict, info = quantize_model(params, batch_stats, sample, cfg)

    n_params = sum(k.size for k, _ in dense_layers(params))
    n_bias = sum(b.size for _, b in dense_layers(params))
    assert save_dict["weights"].dtype == np.int16
    assert save_dict["weights"].size == n_params
    assert save_dict["biases"].size == n_bias
    assert (cfg.paths.arm_data / "w_and_b.mat").exists()
    for li in range(4):
        for part in ("weights", "biases", "outputs"):
            assert f"Layer {li + 1} {part}" in info
    assert "Input" in info

    # .mat round trip
    import scipy.io

    loaded = scipy.io.loadmat(str(cfg.paths.arm_data / "w_and_b.mat"))
    np.testing.assert_array_equal(loaded["weights"].ravel(), save_dict["weights"])


def test_reference_range_mode(tmp_path, trained_like_state):
    model, params, batch_stats = trained_like_state
    cfg = Config().replace(paths={"root": str(tmp_path)})
    sample = np.random.default_rng(4).standard_normal((50, 6)).astype(np.float32)
    _, info_full = quantize_model(
        params, batch_stats, sample, cfg, range_mode="full", save=False
    )
    _, info_ref = quantize_model(
        params, batch_stats, sample, cfg, range_mode="reference",
        fold_bn=False, save=False,
    )
    assert set(info_full) == set(info_ref)


def test_quantized_predict_agrees_with_float(trained_like_state):
    model, params, batch_stats = trained_like_state
    cfg = Config()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((256, 6)).astype(np.float32)
    float_pred = np.asarray(
        jnp.argmax(
            model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            ),
            -1,
        )
    )
    q_pred = quantized_predict(params, batch_stats, x, cfg)
    agreement = (float_pred == q_pred).mean()
    assert agreement > 0.95, f"quantized/float agreement {agreement}"


def test_quantized_predict_int_bit_exact_vs_float64_oracle(
    trained_like_state,
):
    """The integer pipeline must be bit-identical to an exact float64
    simulation of the Q-format spec: quantize input, exact accumulate,
    bias align, integer ReLU, round-half-even requantize, saturate.
    float64 is exact here (every intermediate < 2^52)."""
    from amcpy_tpu.ops.quantize import (
        fold_batchnorm as _fold,
        quantized_predict_int,
    )

    model, params, batch_stats = trained_like_state
    cfg = Config()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((512, 6)).astype(np.float32)
    _, info = quantize_model(params, batch_stats, x, cfg, save=False)

    def frac(fmt):
        return int(fmt.split(".")[1])

    # exact float64 oracle of the integer spec
    layers = _fold(params, batch_stats)
    h = quantize_array(x, info["Input"]).astype(np.float64)
    n_h = frac(info["Input"])
    for li, (k, b) in enumerate(layers):
        fw, fb, fo = (
            info[f"Layer {li + 1} {p}"] for p in ("weights", "biases", "outputs")
        )
        kq = quantize_array(k, fw).astype(np.float64)
        bq = quantize_array(b, fb).astype(np.float64)
        acc = h @ kq + bq * 2.0 ** (n_h + frac(fw) - frac(fb))
        if li < len(layers) - 1:
            acc = np.maximum(acc, 0.0)
        h = np.clip(
            np.round(acc / 2.0 ** (n_h + frac(fw) - frac(fo))),
            -(1 << 14), (1 << 14) - 1,
        )
        n_h = frac(fo)

    got_q = quantized_predict_int(
        params, batch_stats, x, cfg, info, return_q=True
    )
    np.testing.assert_array_equal(got_q, h.astype(np.int16))


def test_quantized_predict_int_agrees_with_float_sim(trained_like_state):
    """The float32 simulation is the fast approximation of the integer
    ground truth — class predictions must agree almost everywhere."""
    model, params, batch_stats = trained_like_state
    cfg = Config()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1024, 6)).astype(np.float32)
    int_pred = quantized_predict(params, batch_stats, x, cfg, arithmetic="int")
    float_pred = quantized_predict(params, batch_stats, x, cfg)
    agreement = (int_pred == float_pred).mean()
    assert agreement > 0.99, f"int/float sim agreement {agreement}"


def test_full_mode_final_layer_range_covers_negative_logits(
    trained_like_state,
):
    """range_mode="full" must take the final layer's real range — logits
    are routinely negative (round-1 pinned every min to 0.0)."""
    model, params, batch_stats = trained_like_state
    cfg = Config()
    rng = np.random.default_rng(6)
    sample = rng.standard_normal((200, 6)).astype(np.float32)
    _, info = quantize_model(
        params, batch_stats, sample, cfg, range_mode="full", save=False
    )
    # recompute true logit range through the folded chain
    h = sample.astype(np.float64)
    layers = fold_batchnorm(params, batch_stats)
    for li, (k, b) in enumerate(layers):
        h = h @ k + b
        if li < len(layers) - 1:
            h = np.maximum(h, 0.0)
    fmt = info[f"Layer {len(layers)} outputs"]
    lo, hi = q_range(fmt)
    assert h.min() < 0  # the premise: logits go negative
    assert lo <= h.min() and h.max() <= hi


def test_quantized_predict_simulates_fixed_point_activations(
    trained_like_state,
):
    """The MCU simulation must quantize input + activations, not just
    weights: with a coarse activation format the two paths must differ on
    logits, and the fixed-point path must round-trip exactly through the
    recorded Q-formats."""
    model, params, batch_stats = trained_like_state
    cfg = Config()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 6)).astype(np.float32)
    _, info = quantize_model(params, batch_stats, x, cfg, save=False)
    # force a deliberately coarse input format: if activations were NOT
    # quantized this would have zero effect on predictions
    coarse = dict(info)
    coarse["Input"] = "Q6.9"
    for li in range(4):
        coarse[f"Layer {li + 1} outputs"] = "Q6.9"
    pred_weights_only = quantized_predict(
        params, batch_stats, x, cfg, coarse, quantize_activations=False
    )
    pred_fixed = quantized_predict(params, batch_stats, x, cfg, coarse)
    # Q6.9 keeps only ~3 fractional bits of signal: some logits flip
    assert (pred_weights_only != pred_fixed).any() or not np.allclose(
        dequantize_array(quantize_array(x, "Q6.9"), "Q6.9"), x
    )
    # with the properly recorded formats the simulation still agrees well
    pred_good = quantized_predict(params, batch_stats, x, cfg, info)
    float_pred = np.asarray(
        jnp.argmax(
            model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            ),
            -1,
        )
    )
    assert (pred_good == float_pred).mean() > 0.9


def test_evaluate_quantized_by_snr_delta_budget(trained_like_state):
    """End-to-end int16-vs-float accuracy delta stays within budget on a
    synthetic separable feature set (BASELINE config 4 deliverable)."""
    from amcpy_tpu.ops.quantize import evaluate_quantized_by_snr
    from amcpy_tpu.preprocessing import Standardizer
    from amcpy_tpu.train.evaluate import evaluate_by_snr
    from amcpy_tpu.train.training import TrainState

    model, params, batch_stats = trained_like_state
    cfg = Config().replace(signals={"num_frames": 20})
    rng = np.random.default_rng(8)
    feats = {
        m: rng.standard_normal((16, 20, 18)).astype(np.float32)
        for m in cfg.signals.modulations_with_noise
    }
    cols = list(cfg.features.used_columns)
    flat = np.concatenate(
        [feats[m][:, :, cols].reshape(-1, len(cols)) for m in feats]
    )
    scaler = Standardizer.fit(flat)
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=None,
        step=jnp.zeros((), jnp.int32),
    )
    acc_f = evaluate_by_snr(model, state, scaler, feats, cfg)
    _, info = quantize_model(
        params, batch_stats, scaler.transform(flat), cfg, save=False
    )
    acc_q = evaluate_quantized_by_snr(
        params, batch_stats, scaler, feats, cfg, info
    )
    assert acc_q.shape == acc_f.shape == (6, 16)
    # untrained model => near-chance everywhere, but the int16 pipeline
    # must track the float pipeline closely
    assert np.max(np.abs(acc_f - acc_q)) <= 0.1


def test_emit_c_header_compiles_and_matches_int_pipeline(
    tmp_path, trained_like_state
):
    """`amc quantize --emit-c` ships a compilable C implementation: gcc
    builds the generated header and the binary's class ids match the
    Python integer pipeline on every sample — the deployment artifact is
    bit-exact end-to-end, not a layout the firmware must re-implement."""
    import shutil
    import subprocess

    from amcpy_tpu.ops.quantize import (
        emit_c_header,
        quantize_model,
        quantized_predict_int,
    )
    from amcpy_tpu.preprocessing import Standardizer

    if not (shutil.which("gcc") or shutil.which("cc")):
        pytest.skip("no C compiler")
    model, params, bstats = trained_like_state
    cfg = Config().replace(paths={"root": str(tmp_path)})
    rng = np.random.default_rng(11)
    raw = rng.standard_normal((64, 6)).astype(np.float32) * 2.0 + 0.3
    scaler = Standardizer.fit(raw)
    sample = scaler.transform(raw).astype(np.float32)
    _, info = quantize_model(params, bstats, sample, cfg, save=False)

    header = emit_c_header(
        params, bstats, scaler, cfg, info, path=tmp_path / "amc_weights.h"
    )
    want = quantized_predict_int(params, bstats, sample, cfg, info)

    rows = ",\n".join(
        "{" + ", ".join(f"{float(v)!r}f" for v in row) + "}" for row in raw
    )
    (tmp_path / "main.c").write_text(
        '#include <stdio.h>\n#include "amc_weights.h"\n'
        f"static const float t[{len(raw)}][AMC_INPUT_DIM] = {{{rows}}};\n"
        "int main(void) {\n"
        f"    for (int s = 0; s < {len(raw)}; s++)\n"
        '        printf("%d\\n", amc_classify(t[s]));\n'
        "    return 0;\n}\n"
    )
    cc = shutil.which("gcc") or shutil.which("cc")
    subprocess.run(
        [cc, "-O2", "-o", str(tmp_path / "amc_test"),
         str(tmp_path / "main.c"), "-lm"],
        check=True, cwd=tmp_path, capture_output=True,
    )
    out = subprocess.run(
        [str(tmp_path / "amc_test")], check=True, capture_output=True,
        text=True,
    )
    got = np.asarray([int(v) for v in out.stdout.split()])
    np.testing.assert_array_equal(got, want)
    assert header.exists()
