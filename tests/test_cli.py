"""End-to-end CLI pipeline test on a tiny synthetic dataset:
generate -> extract -> plot -> train -> eval -> quantize, all through the
public ``amc`` entry point (library surface of ``amcpy_tpu.cli.main``)."""

import json

import numpy as np
import pytest

from amcpy_tpu.cli import main


@pytest.fixture(scope="module")
def project_root(tmp_path_factory):
    return tmp_path_factory.mktemp("amc_project")


def _run(root, *argv):
    main(["--root", str(root), *argv])


def test_full_pipeline(project_root):
    root = project_root
    _run(root, "generate", "--seed", "7", "--frames", "24", "--frame-size", "128")
    assert (root / "mat-data" / "all_modulations.mat").exists()

    # config must carry the generated frame size through later stages
    cfg_yaml = root / "cfg.yaml"
    cfg_yaml.write_text(
        "signals:\n  num_frames: 24\n  frame_size: 128\n"
        "training:\n  epochs: 6\n  batch_size: 64\n"
    )

    main(["--root", str(root), "--config", str(cfg_yaml), "extract"])
    for mod in ("BPSK", "QPSK", "8PSK", "16QAM", "64QAM", "WGN"):
        assert (root / "calculated-features" / f"{mod}_features.mat").exists()

    main(["--root", str(root), "--config", str(cfg_yaml), "plot"])
    assert (root / "figures" / "features" / "all_plots.html").exists()
    assert (root / "figures" / "features" / "ft2_mean.png").exists()

    main(
        ["--root", str(root), "--config", str(cfg_yaml), "train",
         "--epochs", "5", "--seed", "0"]
    )
    ckpts = list((root / "ann").glob("model-*.msgpack"))
    assert len(ckpts) == 1
    model_id = ckpts[0].stem.replace("model-", "")
    meta = json.loads((root / "ann" / f"model-{model_id}.json").read_text())
    # --epochs flag must actually reach training (reference defect 6 fixed)
    assert len(meta["history"]["loss"]) == 5
    assert (root / "figures" / f"cm-{model_id}.png").exists()
    assert (root / "figures" / f"accuracy-{model_id}.png").exists()
    assert (root / "figures" / f"history-{model_id}.png").exists()
    assert (root / "figures" / f"{model_id}_figure_data.mat").exists()

    main(["--root", str(root), "--config", str(cfg_yaml), "eval", model_id])

    main(["--root", str(root), "--config", str(cfg_yaml), "quantize", model_id])
    assert (root / "arm-data" / "w_and_b.mat").exists()

    import scipy.io

    acc = scipy.io.loadmat(str(root / "figures" / f"{model_id}_figure_data.mat"))[
        "acc"
    ]
    assert acc.shape == (6, 16)
    # sanity: the classifier should beat chance on high-SNR synthetic data
    assert acc[:, -4:].mean() > 1.0 / 6.0


def test_cli_requires_command(project_root):
    with pytest.raises(SystemExit):
        main(["--root", str(project_root)])


def test_sweep_command(project_root):
    """Runs after test_full_pipeline (module-scoped fixture keeps artifacts)."""
    cfg_yaml = project_root / "cfg.yaml"
    main(
        ["--root", str(project_root), "--config", str(cfg_yaml),
         "sweep", "--trials", "2", "--seed", "1"]
    )
    import json

    log = (project_root / "metrics" / "sweep.jsonl").read_text().strip()
    assert len(log.splitlines()) == 2
    best_yaml = project_root / "metrics" / "sweep_best.yaml"
    assert best_yaml.exists()
    import yaml

    best = yaml.safe_load(best_yaml.read_text())
    assert "training" in best and "hidden_sizes" in best["training"]


def test_quantize_compare_command(project_root, capsys):
    """`amc quantize --compare` emits the float-vs-int16 accuracy overlay
    and both confusion-matrix figures (VERDICT r1 item 3)."""
    cfg_yaml = project_root / "cfg.yaml"
    main(["--root", str(project_root), "--config", str(cfg_yaml),
          "quantize", "--compare"])
    out = capsys.readouterr().out
    assert "Max per-SNR accuracy delta" in out
    model_id = next(
        (project_root / "ann").glob("model-*.msgpack")
    ).stem.replace("model-", "")
    assert (project_root / "figures" / f"quant-accuracy-{model_id}.png").exists()
    assert (project_root / "figures" / f"quant-cm-float-{model_id}.png").exists()
    assert (project_root / "figures" / f"quant-cm-int16-{model_id}.png").exists()


def test_classify_command(project_root, capsys):
    """Classify a dataset modulation and a raw capture via the CLI."""
    cfg_yaml = project_root / "cfg.yaml"
    main(["--root", str(project_root), "--config", str(cfg_yaml),
          "classify", "BPSK"])
    out = capsys.readouterr().out
    assert "SNR +20 dB" in out

    # raw capture file
    import numpy as np
    import scipy.io

    raw = scipy.io.loadmat(
        str(project_root / "mat-data" / "all_modulations.mat"),
        variable_names=["signal_qpsk"],
    )["signal_qpsk"]
    stream = np.concatenate(
        [np.zeros(2400, np.complex64), raw[-1].reshape(-1).astype(np.complex64)]
    )
    cap = project_root / "capture.bin"
    stream.tofile(cap)
    out_npy = project_root / "preds.npy"
    main(["--root", str(project_root), "--config", str(cfg_yaml),
          "classify", str(cap), "--frame-size", "128",
          "--out", str(out_npy)])
    preds = np.load(out_npy)
    assert preds.shape == (24,)


def test_train_resume_command(project_root):
    """Interrupt + resume must be equivalent to an uninterrupted run in its
    artifacts: full-length history (restored + new epochs, VERDICT r1 item
    6), correct epoch counter, and a checkpoint loadable for eval."""
    cfg_yaml = project_root / "cfg.yaml"
    ckpts_before = set((project_root / "ann").glob("model-*.msgpack"))
    first = sorted(ckpts_before)[0].stem.replace("model-", "")
    main(["--root", str(project_root), "--config", str(cfg_yaml),
          "train", "--epochs", "7", "--resume", first])
    import json

    newest = max(
        (project_root / "ann").glob("model-*.json"),
        key=lambda p: p.stat().st_mtime,
    )
    meta = json.loads(newest.read_text())
    # resumed from epoch 5 -> history covers ALL 7 epochs, like an
    # uninterrupted 7-epoch run (not just the 2 new ones)
    for k in ("loss", "accuracy", "val_loss", "val_accuracy"):
        assert len(meta["history"][k]) == 7
    assert meta["epoch"] == 7
    # the resumed checkpoint is loadable and evaluable
    resumed_id = newest.stem.replace("model-", "")
    main(["--root", str(project_root), "--config", str(cfg_yaml),
          "eval", resumed_id])


def test_info_command(project_root, capsys):
    main(["--root", str(project_root), "info"])
    out = capsys.readouterr().out
    assert "amcpy-tpu" in out and "devices:" in out


def test_extract_without_dataset_friendly_error(tmp_path):
    with pytest.raises(SystemExit, match="amc generate"):
        main(["--root", str(tmp_path), "extract"])


def test_eval_cm_uses_heldout_split(project_root):
    """Runs after test_full_pipeline (module-scoped fixture keeps artifacts).

    `amc eval` and `amc train` must report the SAME confusion matrix
    for the same checkpoint: eval reproduces the held-out split from the
    seed/test_size recorded in the sidecar (VERDICT r3 item 5 — the old
    eval CM included the 80% trained-on rows)."""
    import argparse

    from amcpy_tpu.cli import _eval_cm_dataset
    from amcpy_tpu.config import Config
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.preprocessing import build_dataset, preprocess
    from amcpy_tpu.train import load_checkpoint, resolve_model_id
    from amcpy_tpu.train.evaluate import confusion_counts

    cfg = Config.from_yaml(project_root / "cfg.yaml").replace(
        paths={"root": str(project_root)}
    )
    model_id = resolve_model_id(cfg, None)
    model, state, scaler, meta = load_checkpoint(cfg, model_id)
    features = {
        m: io_mat.load_features(cfg, m)
        for m in cfg.signals.modulations_with_noise
    }
    # what amc train reported: CM on its own x_test
    tcfg = cfg.replace(training={
        "seed": int(meta["config"]["training"]["seed"]),
        "test_size": float(meta["config"]["training"]["test_size"]),
    })
    _, x_te, _, y_te, _ = preprocess(features, tcfg)
    cm_train = confusion_counts(model, state, x_te, y_te, 6)

    # what amc eval now computes by default
    args = argparse.Namespace(mode="test", full_data=False)
    x, y = _eval_cm_dataset(
        cfg, args, meta, lambda mode: build_dataset(features, cfg, mode)
    )
    cm_eval = confusion_counts(model, state, scaler.transform(x), y, 6)
    np.testing.assert_array_equal(cm_eval, cm_train)

    # --full-data keeps the old (biased, but labeled) semantics
    args_full = argparse.Namespace(mode="test", full_data=True)
    x_f, y_f = _eval_cm_dataset(
        cfg, args_full, meta, lambda mode: build_dataset(features, cfg, mode)
    )
    assert x_f.shape[0] > x.shape[0]


def test_resume_adopts_checkpoint_optimizer(project_root):
    """Runs after test_full_pipeline (module-scoped fixture keeps
    artifacts). Resuming without re-passing --optimizer/--lr must restore the
    checkpoint's recorded optimizer (ADVICE r3: an optimizer switch on
    resume crashes on the opt-state pytree or silently changes training)."""
    cfg_yaml = project_root / "cfg.yaml"
    _run(project_root, "--config", str(cfg_yaml), "train",
         "--epochs", "3", "--optimizer", "adam", "--lr", "1e-3",
         "--seed", "3")
    newest = max(
        (project_root / "ann").glob("model-*.json"),
        key=lambda p: p.stat().st_mtime,
    )
    adam_id = newest.stem.replace("model-", "")
    meta = json.loads(newest.read_text())
    assert meta["config"]["training"]["optimizer"] == "adam"

    # resume with NO optimizer flags: must not rebuild the rmsprop default
    _run(project_root, "--config", str(cfg_yaml), "train",
         "--epochs", "5", "--resume", adam_id)
    newest2 = max(
        (project_root / "ann").glob("model-*.json"),
        key=lambda p: p.stat().st_mtime,
    )
    meta2 = json.loads(newest2.read_text())
    assert meta2["config"]["training"]["optimizer"] == "adam"
    assert meta2["config"]["training"]["learning_rate"] == 1e-3
    assert meta2["config"]["training"]["seed"] == 3  # split preserved
    assert len(meta2["history"]["loss"]) == 5


def test_eval_heldout_refuses_on_config_drift(project_root):
    """Runs after test_full_pipeline (module-scoped fixture keeps artifacts).

    If the dataset/SNR selection changed since training, the held-out
    split cannot be reproduced — eval must refuse with a clear error
    instead of silently scoring trained-on rows (code-review r4)."""
    import argparse

    from amcpy_tpu.cli import _eval_cm_dataset
    from amcpy_tpu.config import Config
    from amcpy_tpu.train import load_checkpoint, resolve_model_id

    cfg = Config.from_yaml(project_root / "cfg.yaml").replace(
        paths={"root": str(project_root)}
    )
    model_id = resolve_model_id(cfg, None)
    _, _, _, meta = load_checkpoint(cfg, model_id)
    drifted = cfg.replace(training={"training_snr": (8, 9, 10, 11, 12, 13)})
    args = argparse.Namespace(mode="test", full_data=False)
    with pytest.raises(SystemExit, match="cannot reproduce"):
        _eval_cm_dataset(drifted, args, meta, lambda mode: (None, None))
    # --full-data remains available regardless of drift
    args_full = argparse.Namespace(mode="test", full_data=True)
    assert _eval_cm_dataset(
        drifted, args_full, meta, lambda mode: ("x", "y")
    ) == ("x", "y")


def test_quantize_emit_c(project_root):
    """Runs after test_full_pipeline (module-scoped fixture keeps
    artifacts): `amc quantize --emit-c` writes the firmware header."""
    cfg_yaml = project_root / "cfg.yaml"
    _run(project_root, "--config", str(cfg_yaml), "quantize", "--emit-c")
    header = project_root / "arm-data" / "amc_weights.h"
    assert header.exists()
    text = header.read_text()
    assert "amc_classify" in text and "AMC_NUM_CLASSES 6" in text
    assert "amc_scaler_mean" in text  # standardizer ships with the model
