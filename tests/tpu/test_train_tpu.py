"""Training-path smoke on real TPU hardware (VERDICT r4 item 8).

The CPU suite trains on the virtual mesh; this closes the loop on the
chip: a tiny `amc train`-equivalent run -> checkpoint -> reload ->
held-out per-SNR eval, plus the compiled int24 wire codec's numerical
conformance against the float64 oracle. Skipped off-TPU; run via
``AMCPY_TEST_TPU=1 python -m pytest tests/tpu -q``.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from amcpy_tpu.extraction import backend_is_tpu

pytestmark = pytest.mark.skipif(
    not backend_is_tpu(),
    reason="hardware training tests need a real TPU backend",
)


def test_train_checkpoint_eval_roundtrip(tmp_path):
    """train -> save -> load -> evaluate on the checkpoint's held-out
    frames, all on the chip: the `amc train` + `amc eval` product flow."""
    from amcpy_tpu.config import Config
    from amcpy_tpu.data import synth
    from amcpy_tpu.extraction import run_extraction
    from amcpy_tpu.preprocessing import preprocess, train_frame_mask
    from amcpy_tpu.train import load_checkpoint, save_checkpoint, train
    from amcpy_tpu.train.evaluate import evaluate_by_snr

    cfg = Config().replace(
        paths={"root": str(tmp_path)},
        signals={"frame_size": 256, "num_frames": 20},
        training={"epochs": 6, "batch_size": 64},
    )
    synth.write_dataset(cfg, seed=11)
    features = run_extraction(cfg)
    x_tr, x_te, y_tr, y_te, scaler = preprocess(features, cfg)
    model, state, hist, model_id = train(cfg, x_tr, y_tr, x_te, y_te)
    assert np.isfinite(hist["loss"]).all()
    assert hist["val_accuracy"][-1] > 1.0 / 6.0  # beats chance
    save_checkpoint(cfg, model_id, state, scaler, hist, cfg.training.epochs)

    # reload and evaluate exactly as `amc eval` does: held-out frames of
    # the checkpoint's own split
    model2, state2, scaler2, sidecar = load_checkpoint(cfg, model_id)
    _, _, _, _, _, idx = preprocess(features, cfg, return_indices=True)
    excl = train_frame_mask(cfg, idx[0])
    acc = evaluate_by_snr(model2, state2, scaler2, features, cfg,
                          exclude_mask=excl)
    assert acc.shape == (6, cfg.signals.num_snr)
    assert np.isfinite(acc).all()
    # high-SNR blocks should beat chance comfortably even on 20 frames
    assert acc[:, -3:].mean() > 0.3


def test_wire_int24_compiled_conformance(tmp_path):
    """The int24 wire codec through the COMPILED Mosaic kernel stays
    within the float32-vs-float64 parity budget on real modulated
    frames (the CPU suite only runs it interpreted)."""
    from oracle import features_batch, term_scales

    from amcpy_tpu.config import Config
    from amcpy_tpu.data import synth
    from amcpy_tpu.extraction import extract_batch

    cfg = Config().replace(
        paths={"root": str(tmp_path)},
        signals={"frame_size": 2048, "num_frames": 8},
    )
    data = synth.generate_dataset(cfg, seed=3)
    flat = np.concatenate(
        [np.asarray(v).reshape(-1, 2048) for v in data.values()]
    ).astype(np.complex64)

    tim: dict = {}
    got = extract_batch(flat, kernel="fused", wire="int24", timings=tim)
    assert tim["wire"] == "int24"
    oracle = features_batch(flat.astype(np.complex128))
    tol = 1e-4 * term_scales(flat) + 1e-5 * np.abs(oracle)
    frac = np.abs(got.astype(np.float64) - oracle) / tol
    assert frac.max() < 1.0, f"int24 wire broke parity: {frac.max():.3f}"
