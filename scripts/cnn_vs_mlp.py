"""Head-to-head: raw-IQ CNN family vs the reference-parity feature MLP.

Trains both families on the same full-scale synthetic dataset (default
config: 6 mods x 16 SNR x 1000 frames x 2048 samples), K seeds each, and
records HELD-OUT per-SNR accuracy curves (mean +/- std over seeds) plus
the CNN's raw-IQ inference throughput. Per-SNR accuracy excludes every
frame the model trained on (``train_frame_mask``): training-SNR blocks
are scored on their 20% held-out frames, non-training SNRs on all frames
(never seen in training). Writes ``metrics/cnn_vs_mlp.json`` and a
comparison figure; RESULTS quotes that JSON.

Run on the TPU:  python scripts/cnn_vs_mlp.py [--root DIR] [--seeds K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/amc_cnn_vs_mlp")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--frame-size", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=21)
    ap.add_argument(
        "--families", default="mlp,cnn",
        help="comma list of mlp,cnn,cnn_aug; results merge into an "
             "existing metrics/cnn_vs_mlp.json so arms can run "
             "separately (cnn_aug = phase-rotation + SNR-mixing "
             "augmentation targeting the low-SNR gap)",
    )
    args = ap.parse_args()

    from amcpy_tpu.config import Config
    from amcpy_tpu.data import io_mat, synth
    from amcpy_tpu.extraction import run_extraction
    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.preprocessing import (
        preprocess,
        preprocess_raw,
        train_frame_mask,
    )
    from amcpy_tpu.train import train
    from amcpy_tpu.train.evaluate import evaluate_by_snr, evaluate_by_snr_raw

    cfg = Config().replace(
        paths={"root": args.root},
        signals={"num_frames": args.frames, "frame_size": args.frame_size},
        training={"epochs": args.epochs},
    )
    cfg.paths.ensure_dirs()
    mat = cfg.paths.mat_data / cfg.paths.mat_filename
    if not mat.exists():
        print("[cnn_vs_mlp] generating dataset ...")
        synth.write_dataset(cfg, seed=0)
    data = io_mat.load_dataset(cfg)

    print("[cnn_vs_mlp] extracting features for the MLP arm ...")
    features = run_extraction(cfg)

    out_json = Path("metrics") / "cnn_vs_mlp.json"
    results: dict[str, dict] = (
        json.loads(out_json.read_text()) if out_json.exists() else {}
    )
    results["config"] = {
        "frames": args.frames,
        "frame_size": args.frame_size,
        "epochs": args.epochs,
        "seeds": args.seeds,
        "snr_db": list(cfg.signals.snr_db),
    }

    # the split is a pure function of (labels, test_size, seed), so the
    # held-out mask is identical for both families and all train seeds
    excl = train_frame_mask(cfg, preprocess(
        features, cfg, return_indices=True
    )[-1][0])
    results["config"]["heldout"] = (
        "per-SNR accuracy excludes all trained-on frames "
        "(train_frame_mask); val_accuracy is the 20% held-out split"
    )

    n_classes = len(cfg.signals.modulations_with_noise)
    cnn_models = {
        "cnn": IQConvNet(n_classes=n_classes),
        # phase-rotation + SNR-mixing augmentation (VERDICT r4 item 7):
        # training only sees 10-20 dB blocks while eval spans -10..20 dB;
        # noise injection synthesizes the missing low-SNR regime
        "cnn_aug": IQConvNet(
            n_classes=n_classes,
            aug_phase=True,
            aug_noise_snr_db=(-12.0, 25.0),
        ),
    }
    for family in [f for f in args.families.split(",") if f]:
        curves = []
        val_accs = []
        for seed in range(args.seeds):
            t0 = time.time()
            if family == "mlp":
                x_tr, x_te, y_tr, y_te, scaler = preprocess(features, cfg)
                model, state, hist, _ = train(
                    cfg, x_tr, y_tr, x_te, y_te, seed=seed
                )
                acc = evaluate_by_snr(
                    model, state, scaler, features, cfg, exclude_mask=excl
                )
            else:
                x_tr, x_te, y_tr, y_te = preprocess_raw(data, cfg)
                model, state, hist, _ = train(
                    cfg, x_tr, y_tr, x_te, y_te, seed=seed,
                    model=cnn_models[family],
                )
                acc = evaluate_by_snr_raw(
                    model, state, data, cfg, exclude_mask=excl
                )
            curves.append(np.asarray(acc))
            val_accs.append(float(hist["val_accuracy"][-1]))
            print(
                f"[cnn_vs_mlp] {family} seed {seed}: "
                f"held-out mean acc {np.mean(acc):.4f} "
                f"(high-SNR {np.mean(acc[:, -6:]):.4f}, "
                f"val {val_accs[-1]:.4f}) "
                f"in {time.time() - t0:.1f}s"
            )
        stack = np.stack(curves)  # (seeds, mods, snr)
        per_snr = stack.mean(axis=1)  # (seeds, snr) over modulations
        results[family] = {
            "per_snr_mean": per_snr.mean(axis=0).tolist(),
            "per_snr_std": per_snr.std(axis=0).tolist(),
            "overall_mean": float(stack.mean()),
            "high_snr_mean": float(stack[:, :, -6:].mean()),
            "val_accuracy_per_seed": val_accs,
            "val_accuracy_mean": float(np.mean(val_accs)),
            "val_accuracy_std": float(np.std(val_accs)),
        }

    # CNN raw-IQ inference throughput (batch 4096, bf16 convs on the MXU)
    import jax
    import jax.numpy as jnp

    model = IQConvNet(n_classes=len(cfg.signals.modulations_with_noise))
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 2, args.frame_size), jnp.float32),
        train=False,
    )
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((4096, 2, args.frame_size))
        .astype(np.float32)
    )
    jax.block_until_ready(fwd(variables, x))
    times = []
    for _ in range(7):
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd(variables, x)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / reps)
    ms = float(np.median(times) * 1e3)
    results["cnn_inference"] = {
        "batch": 4096,
        "ms_per_batch": round(ms, 4),
        "frames_per_s": round(4096 / (ms / 1e3), 1),
    }
    print(
        f"[cnn_vs_mlp] CNN inference: {ms:.3f} ms @4096 -> "
        f"{results['cnn_inference']['frames_per_s']:,.0f} frames/s"
    )

    out_path = Path("metrics")
    out_path.mkdir(exist_ok=True)
    (out_path / "cnn_vs_mlp.json").write_text(json.dumps(results, indent=2))
    print(f"[cnn_vs_mlp] wrote {out_path / 'cnn_vs_mlp.json'}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        snr = list(cfg.signals.snr_db)
        fig, ax = plt.subplots(figsize=(8, 5))
        palette = (
            ("mlp", "tab:blue"), ("cnn", "tab:red"),
            ("cnn_aug", "tab:green"),
        )
        for family, color in palette:
            if family not in results:
                continue
            m = np.asarray(results[family]["per_snr_mean"])
            s = np.asarray(results[family]["per_snr_std"])
            ax.plot(snr, m, color=color, marker="o", label=family.upper())
            ax.fill_between(snr, m - s, m + s, color=color, alpha=0.2)
        ax.axhline(1 / 6, ls="--", c="gray", label="chance")
        ax.set_xlabel("SNR (dB)")
        ax.set_ylabel("held-out accuracy (all modulations)")
        ax.set_title(
            f"Raw-IQ CNN vs feature MLP ({args.seeds} seeds, "
            f"held-out frames, mean +/- std)"
        )
        ax.legend()
        ax.grid(alpha=0.3)
        fig.tight_layout()
        Path("figures").mkdir(exist_ok=True)
        fig.savefig("figures/cnn_vs_mlp.png", dpi=120)
        print("[cnn_vs_mlp] wrote figures/cnn_vs_mlp.png")
    except Exception as e:  # matplotlib optional
        print(f"[cnn_vs_mlp] figure skipped: {e}")


if __name__ == "__main__":
    main()
