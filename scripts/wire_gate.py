"""Wire-codec gating experiment on real data + real hardware.

For each candidate wire format (int24, int16) this measures, against the
f32-wire features on the SAME frames from the full-scale dataset:

* the worst fraction of the float32-vs-float64 parity tolerance budget
  (``1e-4 * term_scale + 1e-5 * |oracle|``) consumed vs the FLOAT64
  ORACLE (tests/oracle.py — numerically the reference) — the gate: a
  format passes only if it stays under ``--budget-frac`` (default 0.85)
  of the full budget, alongside the f32-wire control (r4 kernel margin:
  worst 0.27). Comparing codec-vs-f32-kernel instead would mostly
  measure the f32 kernel's own rounding jitter (a tiny input
  perturbation flips f32 roundings at ~0.4-0.8 of budget) and bury the
  actual codec bias (oracle-level: <= 0.16);
* the end-to-end extract_batch wall / H2D seconds / bytes, i.e. the
  actual win on the transfer-bound tunnel.

Writes ``metrics/wire_gate.json`` with a PASS/FAIL verdict per format.
The full-scale ``amc parity`` run (wire=auto) then re-asserts 0/96k
against the actual reference extractor with the winning codec enabled.

Run on the TPU:
    python scripts/wire_gate.py [--root /tmp/amc_cnn_vs_mlp] [--take 1000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/amc_cnn_vs_mlp")
    ap.add_argument("--take", type=int, default=1000,
                    help="frames per SNR per modulation")
    ap.add_argument("--budget-frac", type=float, default=0.85)
    ap.add_argument("--formats", default="int24,int16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from amcpy_tpu.config import Config
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.extraction import extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh
    from oracle import features_batch, term_scales

    cfg = Config().replace(paths={"root": args.root})
    mesh = make_mesh(cfg)

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    print(f"[gate] first-sync warmup {time.perf_counter() - t0:.1f}s",
          flush=True)

    formats = [f for f in args.formats.split(",") if f]
    report: dict = {
        "take_per_snr": args.take,
        "budget_frac_gate": args.budget_frac,
        "formats": {},
    }
    # accumulate worst budget fractions per format across all mods
    worst = {f: 0.0 for f in formats}
    worst["f32"] = 0.0
    worst_per_feature = {f: np.zeros(18) for f in [*formats, "f32"]}
    times: dict = {"f32": [0.0, 0.0, 0]}
    for f in formats:
        times[f] = [0.0, 0.0, 0]  # wall, h2d, bytes
    n_total = 0

    for mod in cfg.signals.modulations_with_noise:
        raw = io_mat.load_modulation(cfg, mod)[:, : args.take]
        flat = np.ascontiguousarray(raw.reshape(-1, raw.shape[-1]))
        n_total += flat.shape[0]

        tim: dict = {}
        t0 = time.perf_counter()
        base = extract_batch(
            flat, mesh=mesh, kernel="fused", wire="f32", timings=tim
        ).astype(np.float64)
        times["f32"][0] += time.perf_counter() - t0
        times["f32"][1] += tim["h2d_s"]
        times["f32"][2] += tim["bytes_h2d"]

        # float64 oracle + the parity tolerance budget
        oracle = features_batch(flat.astype(np.complex128))
        tol = 1e-4 * term_scales(flat) + 1e-5 * np.abs(oracle)
        fr0 = np.abs(base - oracle) / tol
        worst["f32"] = max(worst["f32"], float(fr0.max()))
        worst_per_feature["f32"] = np.maximum(
            worst_per_feature["f32"], fr0.max(axis=0)
        )
        print(
            f"[gate] {mod} f32 control: worst budget fraction "
            f"{fr0.max():.3f}", flush=True,
        )

        for f in formats:
            tim = {}
            t0 = time.perf_counter()
            got = extract_batch(
                flat, mesh=mesh, kernel="fused", wire=f, timings=tim
            ).astype(np.float64)
            times[f][0] += time.perf_counter() - t0
            times[f][1] += tim["h2d_s"]
            times[f][2] += tim["bytes_h2d"]
            assert tim["wire"] == f, f"codec {f} not active ({tim})"
            fr = np.abs(got - oracle) / tol
            frac = float(fr.max())
            worst[f] = max(worst[f], frac)
            worst_per_feature[f] = np.maximum(
                worst_per_feature[f], fr.max(axis=0)
            )
            top = np.argsort(fr.max(axis=0))[-3:][::-1]
            print(
                f"[gate] {mod} {f}: worst budget fraction {frac:.3f} "
                f"(top features: "
                + ", ".join(
                    f"F{k + 1}={fr.max(axis=0)[k]:.3f}" for k in top
                )
                + ")",
                flush=True,
            )

    f32_wall, f32_h2d, f32_bytes = times["f32"]
    report["f32"] = {
        "worst_budget_fraction": round(worst["f32"], 4),
        "worst_per_feature": [
            round(float(v), 4) for v in worst_per_feature["f32"]
        ],
        "wall_s": round(f32_wall, 2),
        "h2d_s": round(f32_h2d, 2),
        "bytes": int(f32_bytes),
        "frames_per_s": round(n_total / f32_wall, 1),
    }
    for f in formats:
        wall, h2d, nbytes = times[f]
        report["formats"][f] = {
            "worst_budget_fraction": round(worst[f], 4),
            "worst_per_feature": [
                round(float(v), 4) for v in worst_per_feature[f]
            ],
            "pass": bool(worst[f] <= args.budget_frac),
            "wall_s": round(wall, 2),
            "h2d_s": round(h2d, 2),
            "bytes": int(nbytes),
            "bytes_vs_f32": round(nbytes / max(f32_bytes, 1), 3),
            "frames_per_s": round(n_total / wall, 1),
            "speedup_vs_f32": round(f32_wall / wall, 3),
        }
        v = report["formats"][f]
        print(
            f"[gate] {f}: {'PASS' if v['pass'] else 'FAIL'} "
            f"(budget {v['worst_budget_fraction']:.3f} <= "
            f"{args.budget_frac}), {v['frames_per_s']:,.0f} frames/s "
            f"({v['speedup_vs_f32']}x vs f32, bytes {v['bytes_vs_f32']}x)",
            flush=True,
        )

    out = Path("metrics")
    out.mkdir(exist_ok=True)
    (out / "wire_gate.json").write_text(json.dumps(report, indent=2))
    print(f"[gate] wrote {out / 'wire_gate.json'}", flush=True)


if __name__ == "__main__":
    main()
