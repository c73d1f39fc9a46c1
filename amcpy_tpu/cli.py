"""Command-line interface.

Mirrors the reference CLI surface (``/root/reference/src/amcpy/main.py:25-65``:
``extract | plot | train | eval | quantize | full``) plus a ``generate``
command for the synthetic dataset the reference lacked. Unlike the
reference — whose ``--epochs/--batch-size/--lr/--optimizer`` flags were
parsed but never reached training (SURVEY.md sec 3 defect 6) — every flag
here threads into the frozen config via ``Config.replace`` before any work
starts.
"""

from __future__ import annotations

import argparse
import sys

from amcpy_tpu.config import Config

__all__ = ["main", "build_parser"]


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="amc",
        description="amcpy-tpu — TPU-native Automatic Modulation Classification",
    )
    parser.add_argument("--root", default=None, help="project root directory")
    parser.add_argument("--config", default=None, help="YAML config file")
    parser.add_argument(
        "--distributed", action="store_true",
        help="initialize multi-host JAX before any work "
             "(jax.distributed.initialize; also auto-triggered by "
             "AMCPY_NUM_PROCESSES/AMCPY_COORDINATOR/AMCPY_PROCESS_ID)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="Show device/backend/config diagnostics")

    gen_p = sub.add_parser("generate", help="Generate a synthetic IQ dataset")
    gen_p.add_argument("--seed", type=int, default=0)
    gen_p.add_argument("--frames", type=int, default=None)
    gen_p.add_argument("--frame-size", type=int, default=None)

    ext_p = sub.add_parser("extract", help="Extract features from raw .mat data")
    ext_p.add_argument("--force", action="store_true",
                       help="recompute even if artifacts exist")
    ext_p.add_argument("--profile", default=None, metavar="DIR",
                       help="write a jax.profiler trace (XProf) to DIR")
    ext_p.add_argument(
        "--from-synthetic", type=int, default=None, metavar="SEED",
        help="synthesize frames ON DEVICE and extract in one pass "
             "(no raw-IQ host round trip; no mat-data needed)",
    )

    sub.add_parser("plot", help="Generate feature visualisations")

    train_p = sub.add_parser("train", help="Train the neural network")
    train_p.add_argument(
        "--model", choices=["mlp", "cnn"], default="mlp",
        help="mlp = reference-parity feature MLP (needs `amc extract` "
             "artifacts); cnn = raw-IQ IQConvNet trained straight on "
             "all_modulations.mat (no feature stage)",
    )
    train_p.add_argument("--epochs", type=int, default=None)
    train_p.add_argument("--batch-size", type=int, default=None)
    train_p.add_argument("--lr", type=float, default=None)
    train_p.add_argument("--dropout", type=float, default=None)
    train_p.add_argument(
        "--optimizer", choices=["rmsprop", "adam", "nadam"], default=None
    )
    train_p.add_argument("--activation", default=None)
    train_p.add_argument("--seed", type=int, default=None)
    train_p.add_argument(
        "--resume", default=None, metavar="MODEL_ID",
        help="resume mid-training from a checkpoint (params + optimizer "
             "state + epoch counter)",
    )

    eval_p = sub.add_parser("eval", help="Evaluate a trained model")
    eval_p.add_argument("model_id", nargs="?", default=None)
    eval_p.add_argument(
        "--mode", choices=["training", "test"], default="test",
        help="with --full-data: training = high-SNR only; test = all SNR",
    )
    eval_p.add_argument(
        "--full-data", action="store_true",
        help="confusion matrix over the FULL --mode dataset (includes "
             "trained-on frames; optimistically biased). Default: the "
             "checkpoint's own held-out split, identical to the CM "
             "`amc train` reports",
    )

    quant_p = sub.add_parser("quantize", help="Quantize model for ARM deployment")
    quant_p.add_argument("model_id", nargs="?", default=None)
    quant_p.add_argument(
        "--range-mode", choices=["full", "reference"], default="full"
    )
    quant_p.add_argument(
        "--no-fold-bn", action="store_true",
        help="export raw Dense weights without folding BatchNorm "
             "(reference-parity layout)",
    )
    quant_p.add_argument(
        "--compare", action="store_true",
        help="evaluate the int16 fixed-point model against float32: "
             "per-SNR accuracy overlay + both confusion matrices as figures",
    )
    quant_p.add_argument(
        "--full-data", action="store_true",
        help="with --compare: confusion matrices over the full dataset "
             "(includes trained-on rows) instead of the checkpoint's "
             "held-out split",
    )
    quant_p.add_argument(
        "--emit-c", action="store_true",
        help="also write arm-data/amc_weights.h — a self-contained C "
             "header (weights + standardizer + reference integer "
             "inference, bit-exact with the Python int16 pipeline) that "
             "drops straight into MCU firmware",
    )

    cls_p = sub.add_parser(
        "classify", help="Classify raw IQ frames with a trained model"
    )
    cls_p.add_argument(
        "input", help=".mat dataset variable (mod name) or binary capture file"
    )
    cls_p.add_argument("--model-id", default=None)
    cls_p.add_argument("--frame-size", type=int, default=None)
    cls_p.add_argument(
        "--out", default=None, help="write predictions to .mat/.npy"
    )

    srv_p = sub.add_parser(
        "serve", help="HTTP classification server over a trained model"
    )
    srv_p.add_argument("--model-id", default=None)
    srv_p.add_argument(
        "--host", default="127.0.0.1",
        help="bind address; the server has no auth layer, so exposing it "
             "beyond loopback is an explicit --host 0.0.0.0 opt-in",
    )
    srv_p.add_argument("--port", type=int, default=8000)

    sweep_p = sub.add_parser("sweep", help="Hyperparameter sweep")
    sweep_p.add_argument("--spec", default=None,
                         help="W&B-format sweep YAML (default: reference space)")
    sweep_p.add_argument("--trials", type=int, default=20)
    sweep_p.add_argument("--seed", type=int, default=0)
    sweep_p.add_argument(
        "--method", choices=["bayes", "random"], default="bayes",
        help="bayes = Tree-structured Parzen Estimator (the reference "
             "sweep.yaml method), random = uniform search",
    )
    sweep_p.add_argument(
        "--parallel", type=int, default=1,
        help="trials per round, each training concurrently on its own "
             "device of the mesh (device-parallel sweep)",
    )

    par_p = sub.add_parser(
        "parity",
        help="Diff the ACTUAL reference extractor against this pipeline "
             "on the dataset (features + downstream accuracy)",
    )
    par_p.add_argument("--ref", default="/root/reference",
                       help="path to the reference checkout")
    par_p.add_argument(
        "--frames-per-snr", type=int, default=None,
        help="subsample frames per (mod, SNR) block (default: all)",
    )
    par_p.add_argument("--no-train", action="store_true",
                       help="skip the downstream accuracy comparison")
    par_p.add_argument("--seed", type=int, default=0)
    par_p.add_argument(
        "--seeds", type=int, default=3,
        help="training seeds per feature set: the accuracy delta is "
             "diffed on mean curves and compared against seed noise",
    )
    par_p.add_argument("--processes", type=int, default=None,
                       help="reference-extractor worker processes")

    sub.add_parser("full", help="Run full pipeline: extract -> plot -> train")
    return parser


def _load_config(args: argparse.Namespace) -> Config:
    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.root:
        cfg = cfg.replace(paths={"root": args.root})
    return cfg


def _adopt_checkpoint_training(cfg: Config, args, meta) -> Config:
    """On ``--resume``, the checkpoint's recorded architecture/optimizer
    settings become the defaults (explicit CLI flags still win): resuming
    an rmsprop-trained model without re-passing ``--optimizer rmsprop``
    must restore an rmsprop optimizer, not rebuild the config default
    around the restored opt_state (pytree-structure crash or a silent
    optimizer switch — ADVICE r3)."""
    t = meta["config"]["training"]
    over = {}
    if "hidden_sizes" in t:
        over["hidden_sizes"] = tuple(t["hidden_sizes"])
    for flag, key in (
        ("dropout", "dropout"),
        ("activation", "activation"),
        ("optimizer", "optimizer"),
        ("lr", "learning_rate"),
        ("seed", "seed"),        # keeps the train/test split identical
        ("_test_size", "test_size"),
    ):
        if getattr(args, flag, None) is None and key in t:
            over[key] = t[key]
    return cfg.replace(training=over) if over else cfg


def _training_overrides(cfg: Config, args: argparse.Namespace) -> Config:
    over = {}
    for flag, key in [
        ("epochs", "epochs"),
        ("batch_size", "batch_size"),
        ("lr", "learning_rate"),
        ("dropout", "dropout"),
        ("optimizer", "optimizer"),
        ("activation", "activation"),
        ("seed", "seed"),
    ]:
        v = getattr(args, flag, None)
        if v is not None:
            over[key] = v
    return cfg.replace(training=over) if over else cfg


def cmd_info(cfg: Config, args: argparse.Namespace) -> None:
    import jax

    import amcpy_tpu
    from amcpy_tpu.data.native_io import available

    print(f"amcpy-tpu {amcpy_tpu.__version__}")
    print(f"jax {jax.__version__}, backend: {jax.default_backend()}")
    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].device_kind}"
          f" ({jax.process_count()} process(es))")
    print(f"native amc_io: {'built' if available() else 'unavailable (NumPy fallback)'}")
    from amcpy_tpu.parallel import mesh as mesh_mod

    from amcpy_tpu.extraction import resolve_kernel

    kernel = cfg.compute.kernel
    resolved = resolve_kernel(kernel)
    print(f"extraction kernel: {kernel}"
          + (f" (resolves to {resolved})" if kernel == "auto" else ""))
    from amcpy_tpu.ops.wire import resolve_wire_format

    wf = cfg.compute.wire_format
    print(f"wire format: {wf}"
          + (f" (resolves to {resolve_wire_format(wf)})"
             if wf == "auto" else ""))
    print(
        f"H2D staging: {mesh_mod._H2D_STREAMS} streams x "
        f"{mesh_mod._STAGE_CHUNK_BYTES >> 20} MB chunks "
        "(AMCPY_H2D_STREAMS / AMCPY_H2D_CHUNK_BYTES)"
    )
    print(f"mesh shape: {tuple(cfg.compute.mesh_shape) or 'auto'} "
          f"({cfg.compute.data_axis}, {cfg.compute.seq_axis})")
    print(f"project root: {cfg.paths.root}")
    for name, p in [
        ("dataset", cfg.paths.mat_data / cfg.paths.mat_filename),
        ("features", cfg.paths.calculated_features),
        ("checkpoints", cfg.paths.trained_ann),
    ]:
        if p.is_dir():
            n = len(list(p.glob("*")))
            print(f"{name}: {p} ({n} files)")
        else:
            print(f"{name}: {p} ({'present' if p.exists() else 'MISSING'})")


def _require(path, hint: str) -> None:
    if not path.exists():
        raise SystemExit(
            f"error: {path} not found — {hint}"
        )


def cmd_generate(cfg: Config, args: argparse.Namespace) -> None:
    from amcpy_tpu.data.synth import write_dataset

    over = {}
    if args.frames:
        over["num_frames"] = args.frames
    if args.frame_size:
        over["frame_size"] = args.frame_size
    if over:
        cfg = cfg.replace(signals=over)
    path = write_dataset(cfg, seed=args.seed)
    print(f"Dataset written -> {path}")


def cmd_extract(cfg: Config, args: argparse.Namespace) -> None:
    from amcpy_tpu.extraction import run_extraction, run_extraction_synthetic

    if getattr(args, "from_synthetic", None) is not None:
        run_extraction_synthetic(cfg, seed=args.from_synthetic)
    else:
        _require(
            cfg.paths.mat_data / cfg.paths.mat_filename,
            "run `amc generate` first (or `amc extract --from-synthetic N` "
            "for on-device synthesis)",
        )
        run_extraction(
            cfg,
            force=getattr(args, "force", False),
            profile_dir=getattr(args, "profile", None),
        )
    print("All feature calculations complete!")


def cmd_plot(cfg: Config, args: argparse.Namespace) -> None:
    from amcpy_tpu.graphics import run_plots

    run_plots(cfg)


def cmd_train(cfg: Config, args: argparse.Namespace) -> None:
    if getattr(args, "model", "mlp") == "cnn":
        _cmd_train_cnn(cfg, args)
        return
    import numpy as np

    from amcpy_tpu.data import io_mat
    from amcpy_tpu.graphics import (
        plot_accuracy_by_snr,
        plot_confusion_matrix,
        plot_history,
    )
    from amcpy_tpu.preprocessing import preprocess
    from amcpy_tpu.train import (
        confusion_counts,
        evaluate_by_snr,
        save_checkpoint,
        train,
    )
    from amcpy_tpu.train.evaluate import save_figure_data

    cfg = _training_overrides(cfg, args)
    cfg.paths.ensure_dirs()
    _require(
        cfg.paths.calculated_features
        / f"{cfg.signals.modulations_with_noise[0]}_features.mat",
        "run `amc extract` first",
    )
    features = {
        m: io_mat.load_features(cfg, m)
        for m in cfg.signals.modulations_with_noise
    }
    initial = None
    prev_scaler = None
    prior_history: dict[str, list[float]] = {}
    if getattr(args, "resume", None):
        from amcpy_tpu.train import load_checkpoint

        _, prev, prev_scaler, meta = load_checkpoint(cfg, args.resume)
        cfg = _adopt_checkpoint_training(cfg, args, meta)
        initial = (
            prev.params, prev.batch_stats, prev.opt_state,
            int(meta.get("epoch") or 0),
        )
        prior_history = meta.get("history") or {}
        print(f"Resuming from {args.resume} at epoch {initial[3]}")
    x_train, x_test, y_train, y_test, scaler = preprocess(features, cfg)
    if prev_scaler is not None:
        # same feature artifacts => refit standardizer is identical; keep
        # the checkpoint's copy for the saved model regardless
        scaler = prev_scaler
    model, state, history, model_id = train(
        cfg, x_train, y_train, x_test, y_test, initial=initial
    )
    if prior_history:
        # the full-run record: restored epochs + new epochs, so history
        # plots after a resume cover the whole training run
        history = {
            k: list(prior_history.get(k, [])) + list(v)
            for k, v in history.items()
        }
    save_checkpoint(cfg, model_id, state, scaler, history, cfg.training.epochs)
    print(f"Model saved -> {cfg.paths.trained_ann}/model-{model_id}.msgpack")

    # every process participates in the (collective) eval programs; only
    # the primary writes the shared artifacts
    from amcpy_tpu.parallel.mesh import is_primary

    acc = evaluate_by_snr(model, state, scaler, features, cfg)
    cm = confusion_counts(
        model, state, x_test, y_test, len(cfg.signals.modulations_with_noise)
    )
    if is_primary():
        save_figure_data(cfg, model_id, acc)
        plot_accuracy_by_snr(acc, model_id, cfg)
        plot_confusion_matrix(cm, model_id, cfg)
        plot_history(history, model_id, cfg)
    print(f"Mean accuracy across SNR: {np.mean(acc):.4f}")


def _cmd_train_cnn(cfg: Config, args: argparse.Namespace) -> None:
    """Train the raw-IQ CNN family straight on the `.mat` dataset.

    No feature-extraction stage: planar frames feed
    :class:`~amcpy_tpu.models.cnn.IQConvNet` through the same one-dispatch
    DP training loop, per-SNR eval, plots, and checkpoint machinery as the
    MLP path. A capability the reference never had — its raw-IQ tooling
    stopped at dataset slicing (``/root/reference/old/dataset.py:8-65``).
    """
    import numpy as np

    from amcpy_tpu.data import io_mat
    from amcpy_tpu.graphics import (
        plot_accuracy_by_snr,
        plot_confusion_matrix,
        plot_history,
    )
    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.preprocessing import Standardizer, preprocess_raw
    from amcpy_tpu.train import save_checkpoint, train
    from amcpy_tpu.train.evaluate import (
        confusion_counts,
        evaluate_by_snr_raw,
        save_figure_data,
    )

    # the frozen training defaults are the reference's W&B-tuned MLP values
    # (lr 1.418e-3 RMSprop, config.py:151-176 of the reference); on the CNN
    # they destabilize eval (measured: val_loss explodes while train acc
    # climbs). CNN default is Adam 3e-4 unless the user says otherwise.
    from amcpy_tpu.config import TrainingConfig

    ref = TrainingConfig()
    cnn_defaults = {}
    if args.optimizer is None and cfg.training.optimizer == ref.optimizer:
        cnn_defaults["optimizer"] = "adam"
    if args.lr is None and cfg.training.learning_rate == ref.learning_rate:
        cnn_defaults["learning_rate"] = 3e-4
    if cnn_defaults:
        cfg = cfg.replace(training=cnn_defaults)
    cfg = _training_overrides(cfg, args)
    cfg.paths.ensure_dirs()
    mat = cfg.paths.mat_data / cfg.paths.mat_filename
    _require(mat, "run `amc generate` first (or provide all_modulations.mat)")
    data = io_mat.load_dataset(cfg)
    n_classes = len(cfg.signals.modulations_with_noise)

    model = IQConvNet(
        n_classes=n_classes,
        dropout=args.dropout if args.dropout is not None else 0.5,
    )
    initial = None
    prior_history: dict[str, list[float]] = {}
    if getattr(args, "resume", None):
        from amcpy_tpu.train import load_checkpoint

        model, prev, _, meta = load_checkpoint(cfg, args.resume)
        cfg = _adopt_checkpoint_training(cfg, args, meta)
        initial = (
            prev.params, prev.batch_stats, prev.opt_state,
            int(meta.get("epoch") or 0),
        )
        prior_history = meta.get("history") or {}
        print(f"Resuming from {args.resume} at epoch {initial[3]}")
    x_train, x_test, y_train, y_test = preprocess_raw(data, cfg)
    model, state, history, model_id = train(
        cfg, x_train, y_train, x_test, y_test, initial=initial, model=model
    )
    if prior_history:
        history = {
            k: list(prior_history.get(k, [])) + list(v)
            for k, v in history.items()
        }
    # the CNN is per-frame scale-invariant: persist an identity scaler so
    # every checkpoint consumer sees the same sidecar schema
    scaler = Standardizer(
        mean=np.zeros(1, np.float32), std=np.ones(1, np.float32)
    )
    model_meta = {
        "family": "cnn",
        "input_shape": [2, cfg.signals.frame_size],
        "arch": {
            "channels": list(model.channels),
            "kernel_sizes": list(model.kernel_sizes),
            "strides": list(model.strides),
            "dense": model.dense,
            "dropout": model.dropout,
            "dtype": model.dtype,
        },
    }
    save_checkpoint(
        cfg, model_id, state, scaler, history, cfg.training.epochs,
        model_meta=model_meta,
    )
    print(f"Model saved -> {cfg.paths.trained_ann}/model-{model_id}.msgpack")

    from amcpy_tpu.parallel.mesh import is_primary

    acc = evaluate_by_snr_raw(model, state, data, cfg)
    cm = confusion_counts(model, state, x_test, y_test, n_classes, chunk=4096)
    if is_primary():
        save_figure_data(cfg, model_id, acc)
        plot_accuracy_by_snr(acc, model_id, cfg)
        plot_confusion_matrix(cm, model_id, cfg)
        plot_history(history, model_id, cfg)
    print(f"Mean accuracy across SNR: {np.mean(acc):.4f}")


def _eval_cm_dataset(cfg: Config, args, meta, build):
    """Rows for the eval confusion matrix.

    Default: the checkpoint's OWN held-out split, reproduced from the
    split provenance recorded in the sidecar (seed + test_size; the
    stratified split is a pure function of those) — so `amc eval` and
    `amc train` report the SAME confusion matrix for the same checkpoint.
    The previous behaviour (full --mode dataset, trained-on frames
    included — optimistically biased) is kept behind --full-data.
    Reference eval used x_test only (``main.py:129-137`` ->
    ``nn_model.py:270-281``).
    """
    if getattr(args, "full_data", False):
        return build(args.mode)
    from amcpy_tpu.preprocessing import stratified_split_indices

    tmeta = meta["config"]["training"]
    # the split is a pure function of (labels, test_size, seed) — which
    # only reproduces the checkpoint's held-out set if the assembled
    # dataset is the SAME one it trained on. Detect drift via the
    # recorded provenance instead of silently scoring trained-on rows
    # as held-out (checkpoints from before the provenance fields skip
    # the check, as before).
    smeta = meta["config"].get("signals")
    drift = []
    if smeta is not None:
        for key, now in (
            ("num_frames", cfg.signals.num_frames),
            ("num_snr", cfg.signals.num_snr),
            ("modulations", list(cfg.signals.modulations_with_noise)),
        ):
            if smeta.get(key) != now:
                drift.append(f"{key}: checkpoint {smeta.get(key)} vs {now}")
    if "training_snr" in tmeta and tmeta["training_snr"] != list(
        cfg.training.training_snr
    ):
        drift.append(
            f"training_snr: checkpoint {tmeta['training_snr']} vs "
            f"{list(cfg.training.training_snr)}"
        )
    if drift:
        raise SystemExit(
            "error: cannot reproduce this checkpoint's held-out split — "
            "the dataset/config changed since training ("
            + "; ".join(drift)
            + "). Re-run with the training-time config, or pass "
            "--full-data for the (labeled, trained-rows-included) "
            "full-dataset confusion matrix."
        )
    x, y = build("training")
    _, te = stratified_split_indices(
        y,
        float(tmeta.get("test_size", cfg.training.test_size)),
        int(tmeta.get("seed", cfg.training.seed)),
    )
    return x[te], y[te]


def cmd_eval(cfg: Config, args: argparse.Namespace) -> None:
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.graphics import plot_accuracy_by_snr, plot_confusion_matrix
    from amcpy_tpu.preprocessing import build_dataset
    from amcpy_tpu.train import (
        confusion_counts,
        evaluate_by_snr,
        load_checkpoint,
        resolve_model_id,
    )
    from amcpy_tpu.train.evaluate import save_figure_data

    model_id = resolve_model_id(cfg, args.model_id)
    model, state, scaler, meta = load_checkpoint(cfg, model_id)
    if (meta["config"].get("model") or {}).get("family") == "cnn":
        _cmd_eval_cnn(cfg, args, model, state, model_id, meta)
        return
    features = {
        m: io_mat.load_features(cfg, m)
        for m in cfg.signals.modulations_with_noise
    }
    from amcpy_tpu.parallel.mesh import is_primary

    acc = evaluate_by_snr(model, state, scaler, features, cfg)
    x, y = _eval_cm_dataset(
        cfg, args, meta, lambda mode: build_dataset(features, cfg, mode)
    )
    xs = scaler.transform(x)
    cm = confusion_counts(
        model, state, xs, y, len(cfg.signals.modulations_with_noise)
    )
    if is_primary():
        save_figure_data(cfg, model_id, acc)
        plot_accuracy_by_snr(acc, model_id, cfg)
        plot_confusion_matrix(cm, model_id, cfg)
    import numpy as np

    print(f"Mean accuracy across SNR: {np.mean(acc):.4f}")


def _cmd_eval_cnn(cfg: Config, args, model, state, model_id: str, meta) -> None:
    """Per-SNR + confusion evaluation for a raw-IQ CNN checkpoint."""
    import numpy as np

    from amcpy_tpu.data import io_mat
    from amcpy_tpu.graphics import plot_accuracy_by_snr, plot_confusion_matrix
    from amcpy_tpu.parallel.mesh import is_primary
    from amcpy_tpu.preprocessing import build_raw_dataset
    from amcpy_tpu.train.evaluate import (
        confusion_counts,
        evaluate_by_snr_raw,
        save_figure_data,
    )

    mat = cfg.paths.mat_data / cfg.paths.mat_filename
    _require(mat, "run `amc generate` first (or provide all_modulations.mat)")
    data = io_mat.load_dataset(cfg)
    acc = evaluate_by_snr_raw(model, state, data, cfg)
    x, y = _eval_cm_dataset(
        cfg, args, meta, lambda mode: build_raw_dataset(data, cfg, mode)
    )
    cm = confusion_counts(
        model, state, x, y, len(cfg.signals.modulations_with_noise),
        chunk=4096,
    )
    if is_primary():
        save_figure_data(cfg, model_id, acc)
        plot_accuracy_by_snr(acc, model_id, cfg)
        plot_confusion_matrix(cm, model_id, cfg)
    print(f"Mean accuracy across SNR: {np.mean(acc):.4f}")


def cmd_quantize(cfg: Config, args: argparse.Namespace) -> None:
    import numpy as np

    from amcpy_tpu.data import io_mat
    from amcpy_tpu.ops.quantize import quantize_model
    from amcpy_tpu.preprocessing import build_dataset
    from amcpy_tpu.train import load_checkpoint, resolve_model_id

    model_id = resolve_model_id(cfg, args.model_id)
    model, state, scaler, meta = load_checkpoint(cfg, model_id)
    if (meta["config"].get("model") or {}).get("family") == "cnn":
        raise SystemExit(
            "amc quantize targets the feature-MLP/MCU deployment path "
            "(Q-format Dense export); checkpoint "
            f"{model_id} is a raw-IQ CNN. Train with --model mlp to "
            "produce a quantizable model."
        )
    features = {
        m: io_mat.load_features(cfg, m)
        for m in cfg.signals.modulations_with_noise
    }
    x, _ = build_dataset(features, cfg, "test")
    sample = scaler.transform(x).astype(np.float32)
    _, info = quantize_model(
        state.params,
        state.batch_stats,
        sample,
        cfg,
        range_mode=args.range_mode,
        fold_bn=not args.no_fold_bn,
    )
    for k, v in info.items():
        print(f"  {k} -> {v}")
    print(f"Quantized weights -> {cfg.paths.arm_data / 'w_and_b.mat'}")

    if getattr(args, "emit_c", False):
        from amcpy_tpu.ops.quantize import emit_c_header

        p = emit_c_header(
            state.params, state.batch_stats, scaler, cfg, info,
            fold_bn=not args.no_fold_bn,
        )
        print(f"C header -> {p} (bit-exact with the int16 pipeline)")

    if getattr(args, "compare", False):
        from amcpy_tpu.graphics import (
            plot_confusion_matrix,
            plot_quantization_comparison,
        )
        from amcpy_tpu.ops.quantize import (
            evaluate_quantized_by_snr,
            quantized_predict,
        )
        from amcpy_tpu.train import confusion_counts, evaluate_by_snr

        fold = not args.no_fold_bn
        acc_f = evaluate_by_snr(model, state, scaler, features, cfg)
        acc_q = evaluate_quantized_by_snr(
            state.params, state.batch_stats, scaler, features, cfg, info,
            fold_bn=fold,
        )
        p = plot_quantization_comparison(acc_f, acc_q, model_id, cfg)
        print(f"Float vs int16 per-SNR accuracy -> {p}")

        # held-out rows, like `amc eval` (the float-vs-int16 comparison is
        # about quantization error, but quoting it on trained-on rows
        # would still inflate both CMs)
        x_all, y_all = _eval_cm_dataset(
            cfg,
            argparse.Namespace(
                mode="test", full_data=getattr(args, "full_data", False)
            ),
            meta,
            lambda mode: build_dataset(features, cfg, mode),
        )
        xs = scaler.transform(x_all).astype(np.float32)
        n_cls = len(cfg.signals.modulations_with_noise)
        cm_f = confusion_counts(model, state, xs, y_all, n_cls)
        pred_q = quantized_predict(
            state.params, state.batch_stats, xs, cfg, info, fold_bn=fold,
            arithmetic="int",
        )
        cm_q = np.zeros((n_cls, n_cls), dtype=np.float64)
        np.add.at(cm_q, (np.asarray(y_all), pred_q), 1.0)
        cm_q = np.around(
            cm_q / np.maximum(cm_q.sum(axis=1, keepdims=True), 1), 2
        )
        p_f = plot_confusion_matrix(cm_f, model_id, cfg, tag="quant-cm-float")
        p_q = plot_confusion_matrix(cm_q, model_id, cfg, tag="quant-cm-int16")
        print(f"Confusion matrices -> {p_f}, {p_q}")
        delta = float(np.max(np.abs(acc_f - acc_q)))
        print(
            f"Max per-SNR accuracy delta float vs int16: {delta * 100:.2f} pp "
            f"(mean {float(np.mean(np.abs(acc_f - acc_q))) * 100:.2f} pp)"
        )


def cmd_classify(cfg: Config, args: argparse.Namespace) -> None:
    import numpy as np

    from amcpy_tpu.serve import AMCPipeline

    pipe = AMCPipeline.from_checkpoint(cfg, args.model_id)
    path = args.input
    if path in cfg.signals.modulations_with_noise:
        from amcpy_tpu.data import io_mat

        raw = io_mat.load_modulation(cfg, path)  # (S, F, N)
        preds = pipe.predict(raw.reshape(-1, raw.shape[-1]))
        preds = preds.reshape(raw.shape[0], raw.shape[1])
        true = cfg.signals.modulations_with_noise.index(path)
        acc = (preds == true).mean(axis=-1)
        for si, a in enumerate(acc):
            print(f"SNR {cfg.signals.snr_db[si]:+d} dB: {a * 100:5.1f}%")
    else:
        preds = pipe.classify_stream(path, frame_size=args.frame_size)
        mods = cfg.signals.modulations_with_noise
        counts = np.bincount(preds, minlength=len(mods))
        for mi, mod in enumerate(mods):
            print(f"{mod}: {counts[mi]} frames "
                  f"({100.0 * counts[mi] / max(len(preds), 1):.1f}%)")
    if args.out:
        if args.out.endswith(".mat"):
            import scipy.io

            scipy.io.savemat(args.out, {"predictions": preds})
        else:
            np.save(args.out, preds)
        print(f"Predictions -> {args.out}")


def cmd_serve(cfg: Config, args: argparse.Namespace) -> None:
    from amcpy_tpu.server import serve_forever

    serve_forever(
        cfg, args.model_id, host=args.host, port=args.port
    )


def cmd_sweep(cfg: Config, args: argparse.Namespace) -> None:
    import json

    from amcpy_tpu.data import io_mat
    from amcpy_tpu.preprocessing import preprocess
    from amcpy_tpu.train.sweep import load_sweep_spec, run_sweep

    features = {
        m: io_mat.load_features(cfg, m)
        for m in cfg.signals.modulations_with_noise
    }
    x_train, x_test, y_train, y_test, _ = preprocess(features, cfg)
    spec = load_sweep_spec(args.spec) if args.spec else None
    best, _ = run_sweep(
        cfg, x_train, y_train, x_test, y_test,
        spec=spec, n_trials=args.trials, seed=args.seed,
        method=args.method, parallel=args.parallel,
    )
    print(f"Best trial: {json.dumps(best, indent=2)}")
    best_yaml = cfg.paths.metrics / "sweep_best.yaml"
    import yaml

    hidden = [
        int(best["params"].get(f"layer_size_hl{k}", d))
        for k, d in ((1, 26), (2, 29), (3, 30))
    ]
    best_yaml.write_text(
        yaml.safe_dump(
            {
                "training": {
                    **{
                        k: best["params"][k]
                        for k in (
                            "batch_size", "dropout", "epochs",
                            "learning_rate", "optimizer", "activation",
                        )
                        if k in best["params"]
                    },
                    "hidden_sizes": hidden,
                }
            }
        )
    )
    print(f"Best config -> {best_yaml} (use with: amc --config {best_yaml} train)")


def cmd_parity(cfg: Config, args: argparse.Namespace) -> None:
    from amcpy_tpu.parity import run_parity

    _require(
        cfg.paths.mat_data / cfg.paths.mat_filename,
        "run `amc generate` first",
    )
    report = run_parity(
        cfg,
        ref_root=args.ref,
        frames_per_snr=args.frames_per_snr,
        train_models=not args.no_train,
        seed=args.seed,
        n_seeds=args.seeds,
        processes=args.processes,
    )
    worst = report["worst_error_fraction_of_tolerance"]
    bad = report["frames_outside_tolerance"]
    print(
        f"Feature parity: {bad}/{report['frames_total']} frames outside "
        f"tolerance (worst {worst * 100:.1f}% of budget)"
    )
    if "accuracy" in report:
        a = report["accuracy"]
        b = a["budget"]
        print(
            "Accuracy parity (paired seeds): mean |delta| "
            f"{a['mean_abs_delta'] * 100:.2f} pp, max |delta| "
            f"{a['max_abs_delta'] * 100:.2f} pp per (mod, SNR) cell "
            f"({a.get('n_seeds', 1)} paired seeds) -> budget "
            f"{'PASS' if b['pass'] else 'FAIL'} "
            f"(mean<={b['mean_pp']}pp, max<={b['max_pp']}pp)"
        )
        if a.get("delta_within_seed_noise") is not None:
            print(
                "  -> "
                + (
                    "within paired-seed noise"
                    if a["delta_within_seed_noise"]
                    else "EXCEEDS paired-seed noise (systematic)"
                )
                + f" ({a['cells_exceeding_noise']}/{a['n_cells']} cells "
                "over the family-wise noise bound)"
            )


def cmd_full(cfg: Config, args: argparse.Namespace) -> None:
    cmd_extract(cfg, args)
    cmd_plot(cfg, args)
    cmd_train(cfg, args)


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: makes repeated CLI invocations skip
    recompilation (harmless no-op where unsupported)."""
    import os

    if os.environ.get("AMCPY_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/amcpy_jax"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass


def main(argv: list[str] | None = None) -> None:
    _enable_compile_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    import os

    if args.distributed or os.environ.get("AMCPY_NUM_PROCESSES"):
        from amcpy_tpu.parallel.mesh import init_distributed

        if init_distributed():
            import jax

            print(
                f"[distributed] process {jax.process_index()}/"
                f"{jax.process_count()}, {jax.local_device_count()} local / "
                f"{jax.device_count()} global devices"
            )
    cfg = _load_config(args)
    cfg.paths.ensure_dirs()
    commands = {
        "info": cmd_info,
        "generate": cmd_generate,
        "extract": cmd_extract,
        "plot": cmd_plot,
        "train": cmd_train,
        "eval": cmd_eval,
        "quantize": cmd_quantize,
        "classify": cmd_classify,
        "serve": cmd_serve,
        "sweep": cmd_sweep,
        "parity": cmd_parity,
        "full": cmd_full,
    }
    commands[args.command](cfg, args)


if __name__ == "__main__":
    main(sys.argv[1:])
