"""Serving-path throughput: AMCPipeline directly and over `amc serve`.

Measures the full request path (raw complex64 frames -> labels) both
in-process and through the HTTP server on localhost, batch 4096 x 2048
samples (67 MB/request on the wire as on disk). On the tunneled TPU
backend this is H2D-bound like extraction; the point of the artifact is
(a) the steady-state serving number and (b) that the HTTP layer adds
negligible overhead over the library path. Writes
``metrics/serve_bench.json``.

Run on the TPU:  python scripts/serve_bench.py [--root DIR] [--model-id ID]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/amc_run_r4")
    ap.add_argument("--model-id", default=None)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from amcpy_tpu.config import Config
    from amcpy_tpu.serve import AMCPipeline
    from amcpy_tpu.server import AMCServer

    cfg = Config().replace(paths={"root": args.root})
    n = cfg.signals.frame_size
    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((args.batch, n)).astype(np.float32)
        + 1j * rng.standard_normal((args.batch, n)).astype(np.float32)
    ).astype(np.complex64)

    results: dict = {
        "batch": args.batch,
        "frame_size": n,
        "reps": args.reps,
        "request_bytes": int(frames.nbytes),
    }

    # --- library path --------------------------------------------------
    pipe = AMCPipeline.from_checkpoint(cfg, args.model_id)
    pipe.predict(frames)  # warm (compiles this batch's bucket)
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        pipe.predict(frames)
        times.append(time.perf_counter() - t0)
    lib_s = float(np.median(times))
    results["library"] = {
        "s_per_request": round(lib_s, 3),
        "frames_per_s": round(args.batch / lib_s, 1),
    }
    print(f"[serve-bench] library: {lib_s:.3f} s/request -> "
          f"{args.batch / lib_s:,.0f} frames/s", flush=True)

    # --- HTTP path (localhost) ----------------------------------------
    srv = AMCServer(cfg, args.model_id, host="127.0.0.1", port=0,
                    warmup=False)  # pipeline above already warmed
    host, port = srv.address
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    body = frames.tobytes()
    url = f"http://{host}:{port}/classify"
    try:
        urllib.request.urlopen(  # warm this path end-to-end
            urllib.request.Request(url, data=body, method="POST"),
            timeout=600,
        ).read()
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            req = urllib.request.Request(url, data=body, method="POST")
            out = json.loads(urllib.request.urlopen(req, timeout=600).read())
            times.append(time.perf_counter() - t0)
        assert len(out["labels"]) == args.batch
        http_s = float(np.median(times))
        results["http"] = {
            "s_per_request": round(http_s, 3),
            "frames_per_s": round(args.batch / http_s, 1),
            "overhead_vs_library_pct": round(
                100.0 * (http_s - lib_s) / lib_s, 1
            ),
        }
        print(
            f"[serve-bench] http:    {http_s:.3f} s/request -> "
            f"{args.batch / http_s:,.0f} frames/s "
            f"({results['http']['overhead_vs_library_pct']:+.1f}% vs "
            "library)", flush=True,
        )
    finally:
        srv.shutdown()

    out_path = Path("metrics")
    out_path.mkdir(exist_ok=True)
    (out_path / "serve_bench.json").write_text(json.dumps(results, indent=2))
    print(f"[serve-bench] wrote {out_path / 'serve_bench.json'}", flush=True)


if __name__ == "__main__":
    main()
