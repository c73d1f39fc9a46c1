"""Training / checkpoint / evaluation tests on the 8-device CPU mesh."""

import numpy as np
import pytest

from amcpy_tpu.config import Config
from amcpy_tpu.preprocessing import (
    Standardizer,
    build_dataset,
    preprocess,
    stratified_split,
)
from amcpy_tpu.train import (
    accuracy,
    confusion_counts,
    evaluate_by_snr,
    load_checkpoint,
    resolve_model_id,
    save_checkpoint,
    train,
)


def _fake_features(cfg: Config, rng) -> dict[str, np.ndarray]:
    """Synthetic feature artifacts with class-separable structure."""
    s = cfg.signals
    out = {}
    for li, mod in enumerate(s.modulations_with_noise):
        f = rng.standard_normal((s.num_snr, s.num_frames, 18)).astype(np.float32)
        f += 3.0 * li  # make classes separable
        out[mod] = f
    return out


@pytest.fixture()
def cfg(tmp_path):
    return Config().replace(
        paths={"root": str(tmp_path)},
        signals={"num_frames": 40, "frame_size": 64},
        training={"epochs": 8, "batch_size": 32},
    )


def test_standardizer_matches_sklearn():
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 6)).astype(np.float32) * 5 + 2
    ours = Standardizer.fit(x)
    sk = StandardScaler().fit(x)
    np.testing.assert_allclose(ours.mean, sk.mean_, rtol=1e-5)
    np.testing.assert_allclose(ours.std**2, sk.var_, rtol=1e-4)
    np.testing.assert_allclose(
        ours.transform(x), sk.transform(x), atol=1e-4
    )


def test_build_dataset_layout(cfg):
    rng = np.random.default_rng(1)
    feats = _fake_features(cfg, rng)
    x, y = build_dataset(feats, cfg, "training")
    n_mods = 6
    n_per = len(cfg.training.training_snr) * cfg.signals.num_frames
    assert x.shape == (n_mods * n_per, cfg.features.num_used)
    assert (np.bincount(y) == n_per).all()
    # row (mod, snr, frame) -> check one entry maps to the right column set
    cols = list(cfg.features.used_columns)
    assert cols == [1, 3, 5, 7, 11, 13]  # ids (2,4,6,8,12,14) are 0-based -1
    np.testing.assert_array_equal(
        x[0], feats["BPSK"][cfg.training.training_snr[0], 0, cols]
    )


def test_reference_parity_columns_mode(cfg):
    cfg2 = cfg.replace(features={"reference_parity_columns": True})
    assert list(cfg2.features.used_columns) == [2, 4, 6, 8, 12, 14]


def test_stratified_split_proportions():
    rng = np.random.default_rng(2)
    y = np.repeat(np.arange(6), 100)
    x = rng.standard_normal((600, 4)).astype(np.float32)
    xtr, xte, ytr, yte = stratified_split(x, y, 0.2, seed=42)
    assert len(yte) == 120 and len(ytr) == 480
    assert (np.bincount(yte) == 20).all()
    # determinism
    _, _, ytr2, _ = stratified_split(x, y, 0.2, seed=42)
    np.testing.assert_array_equal(ytr, ytr2)


def test_train_learns_and_checkpoints(cfg):
    rng = np.random.default_rng(3)
    feats = _fake_features(cfg, rng)
    x_train, x_test, y_train, y_test, scaler = preprocess(feats, cfg)
    model, state, history, model_id = train(
        cfg, x_train, y_train, x_test, y_test
    )
    assert len(history["loss"]) == cfg.training.epochs
    # separable classes: must reach high accuracy quickly
    assert history["val_accuracy"][-1] > 0.95
    acc = accuracy(model, state, x_test, y_test)
    assert acc > 0.95

    # checkpoint round-trip preserves behaviour exactly
    save_checkpoint(cfg, model_id, state, scaler, history, cfg.training.epochs)
    model2, state2, scaler2, meta = load_checkpoint(cfg, model_id)
    assert meta["model_id"] == model_id
    np.testing.assert_allclose(scaler2.mean, scaler.mean, rtol=1e-6)
    acc2 = accuracy(model2, state2, x_test, y_test)
    assert acc2 == pytest.approx(acc, abs=1e-6)
    assert resolve_model_id(cfg, None) == model_id

    # per-SNR eval: separable features => near-perfect accuracy everywhere
    snr_acc = evaluate_by_snr(model2, state2, scaler2, feats, cfg)
    assert snr_acc.shape == (6, 16)
    assert snr_acc.mean() > 0.95

    cm = confusion_counts(model2, state2, x_test, y_test, 6)
    assert cm.shape == (6, 6)
    assert np.diag(cm).mean() > 0.95


def test_resume_midtraining(cfg):
    rng = np.random.default_rng(4)
    feats = _fake_features(cfg, rng)
    x_train, x_test, y_train, y_test, scaler = preprocess(feats, cfg)
    short = cfg.replace(training={"epochs": 2})
    model, state, history, mid = train(short, x_train, y_train, x_test, y_test)
    save_checkpoint(short, mid, state, scaler, history, 2)
    _, state2, _, meta = load_checkpoint(cfg, mid)
    # resume for the remaining epochs from the restored full state
    model3, state3, history3, _ = train(
        cfg,
        x_train,
        y_train,
        x_test,
        y_test,
        initial=(state2.params, state2.batch_stats, state2.opt_state, meta["epoch"]),
    )
    assert len(history3["loss"]) == cfg.training.epochs - 2
    assert history3["val_accuracy"][-1] >= history["val_accuracy"][-1] - 0.05


@pytest.mark.parametrize("opt", ["adam", "nadam"])
def test_other_optimizers(cfg, opt):
    rng = np.random.default_rng(5)
    feats = _fake_features(cfg, rng)
    x_train, x_test, y_train, y_test, _ = preprocess(feats, cfg)
    c = cfg.replace(training={"optimizer": opt, "epochs": 6})
    _, _, history, _ = train(c, x_train, y_train, x_test, y_test)
    assert history["val_accuracy"][-1] > 0.9


def test_train_frame_mask_roundtrip():
    """train_frame_mask maps split row indices back to exactly the
    (mod, snr, frame) cells that went into training."""
    from amcpy_tpu.preprocessing import (
        build_dataset,
        stratified_split_indices,
        train_frame_mask,
    )

    cfg = Config().replace(signals={"num_frames": 10, "frame_size": 64})
    rng = np.random.default_rng(0)
    features = {
        m: rng.standard_normal((16, 10, 18)).astype(np.float32)
        for m in cfg.signals.modulations_with_noise
    }
    x, y = build_dataset(features, cfg, "training")
    tr, te = stratified_split_indices(y, cfg.training.test_size,
                                      cfg.training.seed)
    mask = train_frame_mask(cfg, tr)
    assert mask.shape == (6, 16, 10)
    assert mask.sum() == len(tr)
    # split is stratified per CLASS: each mod contributes 80% of its
    # training-SNR frames (6 SNRs x 10 frames -> 48), spread over SNRs;
    # non-training SNRs carry none
    snr_sel = list(cfg.training.training_snr)
    assert mask.sum(axis=(1, 2)).tolist() == [48] * 6
    other = [s for s in range(16) if s not in snr_sel]
    assert mask[:, other, :].sum() == 0
    # row values in x at train indices match the masked feature cells
    cols = list(cfg.features.used_columns)
    i = int(tr[0])
    mod_i, snr_i, frame_i = np.argwhere(
        train_frame_mask(cfg, np.asarray([i]))
    )[0]
    mod = cfg.signals.modulations_with_noise[mod_i]
    np.testing.assert_array_equal(
        x[i], features[mod][snr_i, frame_i, cols]
    )


def test_evaluate_by_snr_exclude_mask():
    """exclude_mask restricts the per-SNR curve to held-out frames."""
    from amcpy_tpu.train.evaluate import _masked_block_accuracy

    correct = np.zeros((2, 3, 4), dtype=bool)
    correct[0, 0, :2] = True  # 2/4 correct
    excl = np.zeros((2, 3, 4), dtype=bool)
    excl[0, 0, :2] = True  # exclude exactly the correct ones
    acc_all = _masked_block_accuracy(correct, None)
    acc_heldout = _masked_block_accuracy(correct, excl)
    assert acc_all[0, 0] == 0.5
    assert acc_heldout[0, 0] == 0.0
    excl2 = np.zeros_like(excl)
    excl2[0, 0, 2:] = True  # exclude the wrong ones
    assert _masked_block_accuracy(correct, excl2)[0, 0] == 1.0


def test_epoch_program_cached_across_trainings():
    """Two train() calls with the same model/schedule must reuse ONE
    jitted epoch program (parity's 10 paired runs and sweep trials
    previously retraced+recompiled per call) — and caching must not
    change results: identical seeds still give identical histories."""
    import numpy as np

    from amcpy_tpu.config import Config
    from amcpy_tpu.train import training as tr

    cfg = Config().replace(training={"epochs": 2, "batch_size": 32})
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 6)).astype(np.float32)
    y = rng.integers(0, 6, 128).astype(np.int32)

    tr._EPOCH_CACHE.clear()
    _, _, h1, _ = tr.train(cfg, x, y, x, y, seed=7)
    assert len(tr._EPOCH_CACHE) == 1
    _, _, h2, _ = tr.train(cfg, x, y, x, y, seed=7)
    assert len(tr._EPOCH_CACHE) == 1  # reused, not retraced
    assert h1 == h2  # cache does not perturb determinism
    # a different geometry compiles its own program
    cfg2 = cfg.replace(training={"batch_size": 16})
    tr.train(cfg2, x, y, x, y, seed=7)
    assert len(tr._EPOCH_CACHE) == 2
