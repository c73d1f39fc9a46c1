"""Benchmark: 18-feature extraction throughput (frames/sec/chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

* ``value`` — steady-state device throughput of the fused extractor on
  2048-sample frames (inputs resident in HBM, outputs left on device;
  matches the pipeline steady state where the dataset is loaded once).
* ``vs_baseline`` — ratio against the reference CPU extractor measured on
  THIS host: the per-frame NumPy implementation with the reference's
  recompute-everything structure (InstantaneousValues rebuilt 4x,
  MomentValues 11 moments rebuilt for each of 9 cumulants — see
  /root/reference/src/amcpy/features.py:104-185), single-thread fps scaled
  by cpu_count() as an upper bound on its 6-process/8-thread farm.

Extra context lines go to stderr; the JSON line is the last stdout line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

FRAME_SIZE = 2048
BATCH = 4096
ITERS = 30
BASELINE_FRAMES = 32


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Reference-equivalent CPU baseline (per-frame NumPy, reference structure)
# ---------------------------------------------------------------------------


def _reference_features_one_frame(x: np.ndarray) -> list[float]:
    """Reference per-frame cost model: same call structure as
    features.py:214-232 — each feature recomputes its own intermediates."""
    from scipy import stats

    def inst():
        a = np.abs(x)
        phase = np.angle(x)
        unwrapped = np.unwrap(phase)
        freq = np.diff(unwrapped) / (2 * np.pi)
        cn = a / np.mean(a) - 1
        return a, phase, freq, cn

    def mom():
        xc = np.conj(x)
        return {
            "m20": np.mean(x**2), "m21": np.mean(x * xc).real,
            "m22": np.mean(xc**2), "m40": np.mean(x**4),
            "m41": np.mean(x**3 * xc), "m42": np.mean(x**2 * xc**2).real,
            "m43": np.mean(x * xc**3), "m60": np.mean(x**6),
            "m61": np.mean(x**5 * xc), "m62": np.mean(x**4 * xc**2).real,
            "m63": np.mean(x**3 * xc**3).real,
        }

    out = []
    out.append(float(np.max(np.abs(np.fft.fft(x)) ** 2 / len(x))))
    out.append(float(np.std(np.abs(np.angle(x)), ddof=1)))
    out.append(float(np.std(np.angle(x), ddof=1)))
    _, _, _, cn = inst()
    out.append(float(np.std(np.abs(cn), ddof=1)))
    _, _, freq, _ = inst()
    out.append(float(np.std(freq, ddof=1)))
    out.append(float(np.mean(np.abs(x))))
    out.append(float(np.sqrt(np.sum(np.abs(x))) / len(x)))
    _, _, _, cn = inst()
    out.append(float(stats.kurtosis(cn, fisher=False)))
    _, _, freq, _ = inst()
    out.append(float(stats.kurtosis(freq, fisher=False)))
    m = mom(); out.append(float(np.abs(m["m20"])))
    m = mom(); out.append(float(np.abs(m["m21"])))
    m = mom(); out.append(float(np.abs(m["m40"] - 3 * m["m20"] ** 2)))
    m = mom(); out.append(float(np.abs(m["m41"] - 3 * m["m20"] * m["m21"])))
    m = mom(); out.append(
        float(np.abs(m["m42"] - np.abs(m["m20"]) ** 2 - 2 * m["m21"] ** 2))
    )
    m = mom(); out.append(
        float(np.abs(m["m60"] - 15 * m["m20"] * m["m40"] + 3 * m["m20"] ** 3))
    )
    m = mom(); out.append(float(np.abs(
        m["m61"] - 5 * m["m21"] * m["m40"] - 10 * m["m20"] * m["m41"]
        + 30 * m["m20"] ** 2 * m["m21"]
    )))
    m = mom(); out.append(float(np.abs(
        m["m62"] - 6 * m["m20"] * m["m42"] - 8 * m["m21"] * m["m41"]
        - m["m22"] * m["m40"] + 6 * m["m20"] ** 2 * m["m22"]
        + 24 * m["m21"] ** 2 * m["m20"]
    )))
    m = mom(); out.append(float(np.abs(
        m["m63"] - 9 * m["m21"] * m["m42"] + 12 * m["m21"] ** 3
        - 3 * m["m20"] * m["m43"] - 3 * m["m22"] * m["m41"]
        + 18 * m["m20"] * m["m21"] * m["m22"]
    )))
    return out


def measure_cpu_baseline() -> float:
    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((BASELINE_FRAMES, FRAME_SIZE))
        + 1j * rng.standard_normal((BASELINE_FRAMES, FRAME_SIZE))
    )
    _reference_features_one_frame(frames[0])  # warm scipy imports
    t0 = time.perf_counter()
    for f in frames:
        _reference_features_one_frame(f)
    dt = time.perf_counter() - t0
    single = BASELINE_FRAMES / dt
    ncpu = os.cpu_count() or 1
    _log(
        f"[bench] reference CPU: {single:,.1f} frames/s single-thread, "
        f"x{ncpu} cpus -> baseline {single * ncpu:,.1f} frames/s"
    )
    return single * ncpu


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from amcpy_tpu.ops.features import extract_features_planar

    dev = jax.devices()[0]
    _log(f"[bench] device: {dev}")
    # Pay the backend's first host<->device sync cost before any timing
    # (some tunneled PJRT backends take minutes on the very first fetch).
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    _log(f"[bench] first-sync warmup: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    iq = rng.standard_normal((BATCH, 2, FRAME_SIZE)).astype(np.float32)
    iqj = jax.device_put(iq, dev)

    # Per-call wall time through a tunneled backend measures RPC latency,
    # not device time — amortize by looping the kernel INSIDE one program.
    # The per-iteration input perturbation depends on the loop counter so
    # nothing can be hoisted or CSE'd.
    def repeated(iq_in, iters):
        def body(k, acc):
            f = extract_features_planar(
                iq_in + k * jnp.float32(1e-12), gmax_mode="matmul"
            )
            return acc + jnp.sum(f)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    rep = jax.jit(repeated, static_argnums=1)

    t0 = time.perf_counter()
    float(rep(iqj, 1))
    _log(f"[bench] compile+run(1): {time.perf_counter() - t0:.1f}s")
    float(rep(iqj, ITERS + 1))  # compile the long variant

    t0 = time.perf_counter()
    float(rep(iqj, 1))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(rep(iqj, ITERS + 1))
    t_many = time.perf_counter() - t0
    dt = (t_many - t_one) / ITERS  # RPC latency cancels
    fps = BATCH / dt
    _log(
        f"[bench] fused extractor: {BATCH} frames x {FRAME_SIZE} samples in "
        f"{dt * 1e3:.3f} ms/iter (amortized) -> {fps:,.0f} frames/s"
    )
    return fps


def main() -> None:
    try:
        import jax

        path = os.path.expanduser("~/.cache/amcpy_jax")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass
    baseline = measure_cpu_baseline()
    fps = measure_tpu()
    print(
        json.dumps(
            {
                "metric": "18-feature extraction throughput "
                f"({FRAME_SIZE}-sample frames, 1 chip)",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
