"""Multi-device scaling benchmark (BASELINE.json config 5).

Weak-scaling sweep of the fused extractor over growing device meshes:
fixed per-device batch, throughput and efficiency vs single device.
On a multi-chip/multi-host TPU this measures real ICI scaling; on the
CPU backend (``--cpu N``) it validates the sharding machinery end-to-end
(the same program XLA would partition over chips).

Usage:
    python scripts/scaling_bench.py            # real backend devices
    python scripts/scaling_bench.py --cpu 8    # 8 virtual CPU devices
    python scripts/scaling_bench.py --seq      # also seq-axis scaling

Prints a table + one JSON line with the scaling-efficiency summary.
Multi-host: launch one process per host with AMCPY_NUM_PROCESSES and
coordinator env vars (see amcpy_tpu.parallel.init_distributed); the mesh
then spans all hosts automatically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force CPU backend with N virtual devices")
    ap.add_argument("--per-device", type=int, default=512,
                    help="frames per device (weak scaling)")
    ap.add_argument("--frame-size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seq", action="store_true",
                    help="also measure sequence-axis scaling")
    ap.add_argument("--overhead", action="store_true",
                    help="fixed-total-batch partition-overhead mode: run the "
                         "SAME total batch on a 1-device and an N-device mesh "
                         "and report the slowdown. On virtual CPU devices "
                         "(which oversubscribe the host's physical cores) this "
                         "is the only honest number — weak-scaling efficiency "
                         "there measures core oversubscription, not ICI.")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from amcpy_tpu.ops.features import extract_features_planar

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].device_kind}",
          file=sys.stderr)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rng = np.random.default_rng(0)

    def time_mesh(n: int, batch: int) -> float:
        """frames/s of the fused extractor on an n-device data mesh."""
        mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1), ("data", "seq"))
        iq = rng.standard_normal((batch, 2, args.frame_size)).astype(
            np.float32
        )
        arr = jax.device_put(iq, NamedSharding(mesh, P("data")))
        out = extract_features_planar(arr)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = extract_features_planar(arr)
        out.block_until_ready()
        return batch / ((time.perf_counter() - t0) / args.iters)

    if args.overhead:
        total = args.per_device * sizes[-1]
        points = []
        for n in sizes:
            fps = time_mesh(n, total)
            points.append({"devices": n, "frames_per_s": fps})
            print(
                f"data={n:3d} dev  batch={total:6d}  {fps:14,.0f} frames/s  "
                f"vs 1-dev {points[0]['frames_per_s'] / fps:5.2f}x",
                file=sys.stderr,
            )
        overhead = points[0]["frames_per_s"] / points[-1]["frames_per_s"] - 1
        print(json.dumps({
            "metric": "partition overhead of fused extraction "
                      "(fixed total batch; isolates sharding/collective cost "
                      "on oversubscribed virtual devices)",
            "total_frames": total,
            "frame_size": args.frame_size,
            "points": points,
            "overhead_at_max_devices": round(overhead, 3),
        }))
        return

    results = []
    for n in sizes:
        b = args.per_device * n
        fps = time_mesh(n, b)
        results.append({"devices": n, "frames_per_s": fps})
        base = results[0]["frames_per_s"]
        eff = fps / (n * base)
        print(
            f"data={n:3d} dev  batch={b:6d}  {fps:14,.0f} frames/s  "
            f"efficiency {eff * 100:6.1f}%",
            file=sys.stderr,
        )

    if args.seq and len(devices) >= 2:
        from amcpy_tpu.parallel.sp import extract_features_sp

        for s in (2, 4):
            if s > len(devices):
                break
            mesh = Mesh(
                np.asarray(devices[: s]).reshape(1, s), ("data", "seq")
            )
            b = args.per_device
            iq = rng.standard_normal((b, 2, args.frame_size)).astype(
                np.float32
            )
            arr = jax.device_put(
                iq, NamedSharding(mesh, P("data", None, "seq"))
            )
            out = extract_features_sp(arr, mesh)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = extract_features_sp(arr, mesh)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
            print(
                f"seq={s:3d} dev  batch={b:6d}  {b / dt:14,.0f} frames/s "
                f"(sequence-parallel)",
                file=sys.stderr,
            )

    base = results[0]["frames_per_s"]
    summary = {
        "metric": "weak-scaling efficiency of fused extraction",
        "per_device_frames": args.per_device,
        "frame_size": args.frame_size,
        "points": results,
        "efficiency_at_max": round(
            results[-1]["frames_per_s"]
            / (results[-1]["devices"] * base),
            3,
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
