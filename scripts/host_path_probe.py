"""Decompose the END-TO-END extraction wall on the real TPU.

The round-3 parity run implied ~367 frames/s end-to-end (.mat -> device
-> features) against a 9.3M frames/s device kernel (VERDICT r3 item 1).
This probe measures each host-path phase separately on real dataset
files so the optimization attacks the dominant term with evidence:

  1. scipy loadmat of one modulation (complex64 blob)
  2. planarize (complex -> (B, 2, N) float32, host copy)
  3. device_put wire throughput at several chunk sizes
  4. device compute (fused kernel, steady state)
  5. feature fetch (D2H, tiny)
  6. current extract_batch wall for the same frames

Usage: python scripts/host_path_probe.py [--root /tmp/amc_cnn_vs_mlp]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/amc_cnn_vs_mlp")
    ap.add_argument("--mod", default="BPSK")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from amcpy_tpu.config import Config
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.data.native_io import planarize

    cfg = Config().replace(paths={"root": args.root})

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    print(f"[probe] first-sync: {time.perf_counter() - t0:.1f}s", flush=True)
    dev = jax.devices()[0]
    print(f"[probe] device: {dev}", flush=True)

    # 1. loadmat
    t0 = time.perf_counter()
    raw = io_mat.load_modulation(cfg, args.mod)  # (S, F, N) complex64
    t_load = time.perf_counter() - t0
    s, f, n = raw.shape
    flat = raw.reshape(s * f, n)
    print(
        f"[probe] loadmat {args.mod}: {t_load:.2f}s for "
        f"{flat.nbytes / 1e6:.0f} MB complex64 ({s * f} frames x {n})",
        flush=True,
    )

    # 2. planarize
    t0 = time.perf_counter()
    planar = planarize(flat)
    t_plan = time.perf_counter() - t0
    print(
        f"[probe] planarize: {t_plan:.2f}s "
        f"({planar.nbytes / 1e6:.0f} MB f32 out)",
        flush=True,
    )

    # 3. device_put throughput at several chunk sizes
    for chunk_frames in (256, 1024, 4096, 16000):
        sub = planar[:chunk_frames]
        # fresh copy so no caching illusions
        sub = np.ascontiguousarray(sub)
        t0 = time.perf_counter()
        arr = jax.device_put(sub, dev)
        t_disp = time.perf_counter() - t0
        arr.block_until_ready()
        t_total = time.perf_counter() - t0
        mb = sub.nbytes / 1e6
        print(
            f"[probe] device_put {chunk_frames:6d} frames ({mb:7.1f} MB): "
            f"dispatch {t_disp:.3f}s, complete {t_total:.3f}s "
            f"-> {mb / t_total:.1f} MB/s",
            flush=True,
        )

    # 3b. two overlapped device_puts from threads (does the wire pipeline?)
    import concurrent.futures as cf

    a = np.ascontiguousarray(planar[:4096])
    b = np.ascontiguousarray(planar[4096:8192])
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(lambda: jax.device_put(a, dev).block_until_ready())
        f2 = ex.submit(lambda: jax.device_put(b, dev).block_until_ready())
        f1.result(); f2.result()
    t_two = time.perf_counter() - t0
    print(
        f"[probe] 2 threaded device_puts of {a.nbytes / 1e6:.0f} MB: "
        f"{t_two:.3f}s -> {2 * a.nbytes / 1e6 / t_two:.1f} MB/s aggregate",
        flush=True,
    )

    # 3c. does device compute overlap an in-flight device_put?
    from amcpy_tpu.ops.fused import extract_features_fused

    i_res = jax.device_put(planar[:4096, 0, :], dev)
    q_res = jax.device_put(planar[:4096, 1, :], dev)
    jax.block_until_ready((i_res, q_res))
    fused = jax.jit(extract_features_fused)
    jax.block_until_ready(fused(i_res, q_res))  # compile
    reps = 200
    t0 = time.perf_counter()
    outs = [fused(i_res, q_res) for _ in range(reps)]
    jax.block_until_ready(outs)
    t_comp = time.perf_counter() - t0
    print(
        f"[probe] fused kernel on resident 4096 frames: "
        f"{t_comp / reps * 1e3:.2f} ms/iter "
        f"({4096 * reps / t_comp / 1e6:.2f}M frames/s)",
        flush=True,
    )
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(1) as ex:
        put_f = ex.submit(lambda: jax.device_put(a, dev).block_until_ready())
        outs = [fused(i_res, q_res) for _ in range(reps)]
        jax.block_until_ready(outs)
        t_comp_during = time.perf_counter() - t0
        put_f.result()
    t_both = time.perf_counter() - t0
    print(
        f"[probe] same compute with a {a.nbytes / 1e6:.0f} MB put in "
        f"flight: compute {t_comp_during:.3f}s, both {t_both:.3f}s "
        f"(put alone was above)",
        flush=True,
    )

    # 4. fetch
    feats = fused(i_res, q_res)
    jax.block_until_ready(feats)
    t0 = time.perf_counter()
    np.asarray(feats)
    print(f"[probe] feature fetch (4096x18): {time.perf_counter() - t0:.3f}s",
          flush=True)

    # 5. current product path for the same modulation
    from amcpy_tpu.extraction import extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(cfg)
    t0 = time.perf_counter()
    out = extract_batch(flat, mesh=mesh, kernel=cfg.compute.kernel)
    t_eb = time.perf_counter() - t0
    print(
        f"[probe] extract_batch({s * f} frames): {t_eb:.2f}s "
        f"-> {s * f / t_eb:,.0f} frames/s end-to-end (excl. loadmat)",
        flush=True,
    )
    assert out.shape == (s * f, 18)


if __name__ == "__main__":
    main()
