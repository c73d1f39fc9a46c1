"""Attribute the full-scale parity run's `wait_s` (VERDICT r4 weak #1).

PARITY_r4.json recorded 107 s of `wait_s` (72% of the pipeline wall) over
the full 96k-frame run while the 16k-slice bench records ~0.1 s. The one
structural difference: in `amc parity` every `extract_batch` call follows
a ~75 s all-CPU reference-extractor phase during which the device/tunnel
sits idle. Hypotheses:

  H1  tunnel idle-reconnect: the relay's reverse (device->host) channel
      decays after tens of seconds idle and the next device_get pays a
      multi-second reconnect;
  H2  CPU starvation: host-side work (e.g. the reference subprocesses
      not fully reaped) steals cycles from the relay;
  H3  misattribution: the h2d streams return before the wire is drained
      and device_get absorbs transfer backlog.

This probe measures extract_batch timings (fused kernel, 16k frames)
under: back-to-back runs, after a 75 s pure sleep, after a 75 s 2-process
CPU burn (mimics the reference phase), and after a 75 s sleep WITH a
keep-alive fetch every 5 s. Prints one timing line per condition.
"""

from __future__ import annotations

import subprocess
import sys
import time

import numpy as np


def burn_cpus(seconds: float, n: int = 2) -> None:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             f"import time;\nt=time.time()\nwhile time.time()-t<{seconds}: pass"]
        )
        for _ in range(n)
    ]
    for p in procs:
        p.wait()


def main() -> None:
    import jax
    import jax.numpy as jnp

    from amcpy_tpu.extraction import extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    print(f"first-sync warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((16000, 2048), dtype=np.float32)
        + 1j * rng.standard_normal((16000, 2048), dtype=np.float32)
    ).astype(np.complex64)
    mesh = make_mesh()

    def run(label: str) -> None:
        tim: dict = {}
        t = time.perf_counter()
        out = extract_batch(frames, mesh=mesh, kernel="fused", timings=tim)
        wall = time.perf_counter() - t
        assert out.shape == (16000, 18)
        print(
            f"{label:24s} wall={wall:7.2f}s prep={tim['host_prep_s']:.2f} "
            f"h2d={tim['h2d_s']:6.2f} wait={tim['wait_s']:6.2f}",
            flush=True,
        )

    run("compile+first")
    run("back-to-back-1")
    run("back-to-back-2")

    print("sleep 75s ...", flush=True)
    time.sleep(75)
    run("after-75s-idle")

    print("cpu burn 75s x2 ...", flush=True)
    burn_cpus(75, 2)
    run("after-75s-cpuburn")

    print("sleep 75s with 5s keepalive fetches ...", flush=True)
    ka = jax.jit(lambda: jnp.zeros((1,)))
    t = time.time()
    while time.time() - t < 75:
        time.sleep(5)
        np.asarray(ka())
    run("after-idle+keepalive")


if __name__ == "__main__":
    main()
