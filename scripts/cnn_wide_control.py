"""Wide-kernel CONTROL arm for the raw-IQ CNN family.

Control arm for the measured claim in ``amcpy_tpu/models/cnn.py``: on
symbol-rate iid-IQ data (one constellation symbol per sample) a wide
temporal kernel averages independent symbols, so the classic k=8
strided stack should underperform the k=1 per-sample default exactly
where fine constellation geometry decides (high SNR). Measured outcome
(TPU, full scale): k=8 still learns (0.88 high-SNR held-out) but trails
k=1 (0.94) at more FLOPs — recorded in ``cnn_wide_kernel_control``.
Trains the k=8 stack on the same full-scale dataset as ``cnn_vs_mlp.py``
and appends the record to ``metrics/cnn_vs_mlp.json``.

Run on the TPU:  python scripts/cnn_wide_control.py [--root DIR]
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
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=21)
    args = ap.parse_args()

    from amcpy_tpu.config import Config
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.preprocessing import (
        preprocess_raw,
        train_frame_mask,
    )
    from amcpy_tpu.train import train
    from amcpy_tpu.train.evaluate import evaluate_by_snr_raw

    cfg = Config().replace(
        paths={"root": args.root},
        training={"epochs": args.epochs},
    )
    data = io_mat.load_dataset(cfg)
    x_tr, x_te, y_tr, y_te, (tr, _) = preprocess_raw(
        data, cfg, return_indices=True
    )
    excl = train_frame_mask(cfg, tr)

    curves, vals = [], []
    for seed in range(args.seeds):
        t0 = time.time()
        model = IQConvNet(
            n_classes=len(cfg.signals.modulations_with_noise),
            kernel_sizes=(8, 8, 8),
            strides=(2, 2, 2),
        )
        model, state, hist, _ = train(
            cfg, x_tr, y_tr, x_te, y_te, seed=seed, model=model
        )
        acc = evaluate_by_snr_raw(model, state, data, cfg, exclude_mask=excl)
        curves.append(np.asarray(acc))
        vals.append(float(hist["val_accuracy"][-1]))
        print(
            f"[wide-control] k=8 seed {seed}: held-out mean "
            f"{np.mean(acc):.4f} (high-SNR {np.mean(acc[:, -6:]):.4f}, "
            f"val {vals[-1]:.4f}) in {time.time() - t0:.1f}s",
            flush=True,
        )
    stack = np.stack(curves)
    out_path = Path("metrics") / "cnn_vs_mlp.json"
    results = json.loads(out_path.read_text()) if out_path.exists() else {}
    results["cnn_wide_kernel_control"] = {
        "arch": {"kernel_sizes": [8, 8, 8], "strides": [2, 2, 2]},
        "seeds": args.seeds,
        "epochs": args.epochs,
        "per_snr_mean": stack.mean(axis=(0, 1)).tolist(),
        "overall_mean": float(stack.mean()),
        "high_snr_mean": float(stack[:, :, -6:].mean()),
        "val_accuracy_per_seed": vals,
        "note": (
            "wide temporal kernels on symbol-rate iid IQ: control arm "
            "for the k=1 per-sample default"
        ),
    }
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(results, indent=2))
    print(f"[wide-control] appended to {out_path}")


if __name__ == "__main__":
    main()
