"""One-process experiment sweep for gamma_max DFT variants + stats roofline.

Runs on the real TPU; prints a timing/accuracy table to stderr and a JSON
summary as the last stdout line. Each variant is timed with the same
amortized fori_loop trick as bench.py (RPC latency cancels), and accuracy
is checked against a float64 NumPy FFT on the host.

Usage:  python -u scripts/gmax_experiments.py
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

import os

BATCH = int(os.environ.get("GMAX_BATCH", 4096))
N = int(os.environ.get("GMAX_N", 2048))
ITERS = int(os.environ.get("GMAX_ITERS", 30))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def dft_tables(factors: tuple[int, ...]):
    """Cooley-Tukey tables for an arbitrary factorization (f1, f2, ..., fk).

    Stage j performs a length-fj DFT over axis j with twiddles between
    stages. Returns list of (Wr, Wi) per stage and (Tr, Ti) twiddles.
    """
    tabs = []
    for j, f in enumerate(factors):
        k = np.arange(f)
        w = np.exp(-2j * np.pi * np.outer(k, k) / f)
        tabs.append((w.real.astype(np.float32), w.imag.astype(np.float32)))
    return tabs


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/amcpy_jax"
    )

    from amcpy_tpu.ops.features import extract_features_planar
    from amcpy_tpu.ops import fft as amcfft

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    log(f"first-sync: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, N)) + 1j * rng.standard_normal((BATCH, N))
    gmax_ref = np.max(np.abs(np.fft.fft(x, axis=-1)) ** 2, axis=-1) / N
    i_h = x.real.astype(np.float32)
    q_h = x.imag.astype(np.float32)
    ij = jax.device_put(i_h, dev)
    qj = jax.device_put(q_h, dev)

    def timeit(fn):
        """Amortized per-call device time of fn(i, q) -> (B,) or scalar."""

        def repeated(i, q, iters):
            def body(k, acc):
                r = fn(i + k * jnp.float32(1e-12), q)
                return acc + jnp.sum(r)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        rep = jax.jit(repeated, static_argnums=2)
        float(rep(ij, qj, 1))
        float(rep(ij, qj, ITERS + 1))
        t0 = time.perf_counter()
        float(rep(ij, qj, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rep(ij, qj, ITERS + 1))
        t2 = time.perf_counter() - t0
        return (t2 - t1) / ITERS

    def accuracy(fn):
        out = np.asarray(jax.jit(fn)(ij, qj))
        rel = np.abs(out - gmax_ref) / np.abs(gmax_ref)
        return float(np.max(rel))

    results = {}

    def run(name, fn, acc=True):
        dt = timeit(fn)
        err = accuracy(fn) if acc else float("nan")
        results[name] = {"ms": round(dt * 1e3, 4), "relerr": err}
        log(f"{name:42s} {dt * 1e3:7.3f} ms   relerr {err:.2e}")

    # ---- gmax variants ----------------------------------------------------
    run("fft (XLA native)", amcfft.gmax_fft)

    def gmax_2f(i, q, n1, n2, prec, karatsuba=False, block=False):
        n = n1 * n2
        k1, k2 = np.arange(n1), np.arange(n2)
        w1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
        w2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
        tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)
        w1r, w1i = jnp.float32(w1.real), jnp.float32(w1.imag)
        w2r, w2i = jnp.float32(w2.real), jnp.float32(w2.imag)
        twr, twi = jnp.float32(tw.real), jnp.float32(tw.imag)
        ar = i.reshape(-1, n1, n2)
        ai = q.reshape(-1, n1, n2)
        dot = partial(
            jnp.einsum, precision=prec, preferred_element_type=jnp.float32
        )

        if block:
            # block-complex: one matmul with 2x contraction width
            # [cr ci] = [ar ai] @ [[w1r^T, w1i^T], [-w1i^T, w1r^T]] along n1
            wb1 = jnp.concatenate(
                [
                    jnp.concatenate([w1r, -w1i], axis=1),
                    jnp.concatenate([w1i, w1r], axis=1),
                ],
                axis=0,
            )  # (2*n1, 2*n1)
            a = jnp.concatenate([ar, ai], axis=1)  # (B, 2*n1, n2)
            c = dot("kn,bnm->bkm", wb1, a)
            cr, ci = c[:, :n1], c[:, n1:]
            cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
            wb2 = jnp.concatenate(
                [
                    jnp.concatenate([w2r, w2i], axis=1),
                    jnp.concatenate([-w2i, w2r], axis=1),
                ],
                axis=0,
            )  # (2*n2, 2*n2)
            cc = jnp.concatenate([cr, ci], axis=2)  # (B, n1, 2*n2)
            xx = dot("bkm,ml->bkl", cc, wb2)
            xr, xi = xx[..., :n2], xx[..., n2:]
        elif karatsuba:
            def cmm1(xr, xi, yr, yi):
                p1 = dot("kn,bnm->bkm", yr, xr)
                p2 = dot("kn,bnm->bkm", yi, xi)
                p3 = dot("kn,bnm->bkm", yr + yi, xr + xi)
                return p1 - p2, p3 - p1 - p2

            def cmm2(xr, xi, yr, yi):
                p1 = dot("bkm,ml->bkl", xr, yr)
                p2 = dot("bkm,ml->bkl", xi, yi)
                p3 = dot("bkm,ml->bkl", xr + xi, yr + yi)
                return p1 - p2, p3 - p1 - p2

            cr, ci = cmm1(ar, ai, w1r, w1i)
            cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
            xr, xi = cmm2(cr, ci, w2r, w2i)
        else:
            cr = dot("kn,bnm->bkm", w1r, ar) - dot("kn,bnm->bkm", w1i, ai)
            ci = dot("kn,bnm->bkm", w1r, ai) + dot("kn,bnm->bkm", w1i, ar)
            cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
            xr = dot("bkm,ml->bkl", cr, w2r) - dot("bkm,ml->bkl", ci, w2i)
            xi = dot("bkm,ml->bkl", cr, w2i) + dot("bkm,ml->bkl", ci, w2r)
        p = jnp.square(xr) + jnp.square(xi)
        return jnp.max(p.reshape(-1, n), axis=-1) / n

    P = jax.lax.Precision
    for n1, n2 in [(8, 256), (16, 128), (32, 64), (64, 32), (128, 16)]:
        run(
            f"matmul ({n1},{n2}) default-prec",
            partial(gmax_2f, n1=n1, n2=n2, prec=P.DEFAULT),
        )
    for prec, nm in [(P.HIGHEST, "highest"), ("bfloat16_3x", "bf16_3x")]:
        for n1, n2 in [(8, 256), (16, 128)]:
            try:
                run(
                    f"matmul ({n1},{n2}) {nm}",
                    partial(gmax_2f, n1=n1, n2=n2, prec=prec),
                )
            except Exception as e:  # precision name may not exist
                log(f"matmul ({n1},{n2}) {nm}: SKIP {type(e).__name__} {e}")
    run(
        "matmul (16,128) karatsuba",
        partial(gmax_2f, n1=16, n2=128, prec=P.DEFAULT, karatsuba=True),
    )
    run(
        "matmul (8,256) karatsuba",
        partial(gmax_2f, n1=8, n2=256, prec=P.DEFAULT, karatsuba=True),
    )
    run(
        "matmul (16,128) block-complex",
        partial(gmax_2f, n1=16, n2=128, prec=P.DEFAULT, block=True),
    )
    run(
        "matmul (8,256) block-complex",
        partial(gmax_2f, n1=8, n2=256, prec=P.DEFAULT, block=True),
    )

    # three-factor Cooley-Tukey: DFT over each reshaped axis + twiddles
    def gmax_3f2(i, q, f1, f2, f3, prec=P.DEFAULT):
        n = f1 * f2 * f3
        dot = partial(
            jnp.einsum, precision=prec, preferred_element_type=jnp.float32
        )

        def dftmat(f):
            k = np.arange(f)
            w = np.exp(-2j * np.pi * np.outer(k, k) / f)
            return jnp.float32(w.real), jnp.float32(w.imag)

        w1r, w1i = dftmat(f1)
        w2r, w2i = dftmat(f2)
        w3r, w3i = dftmat(f3)
        k1 = np.arange(f1)
        t1 = np.exp(
            -2j * np.pi * np.outer(k1, np.arange(f2 * f3)) / n
        ).reshape(f1, f2, f3)
        t1r, t1i = jnp.float32(t1.real), jnp.float32(t1.imag)
        k2 = np.arange(f2)
        t2 = np.exp(-2j * np.pi * np.outer(k2, np.arange(f3)) / (f2 * f3))
        t2r, t2i = jnp.float32(t2.real), jnp.float32(t2.imag)

        ar = i.reshape(-1, f1, f2, f3)
        ai = q.reshape(-1, f1, f2, f3)

        def cmm(eq, xr, xi, yr, yi):
            return (
                dot(eq, yr, xr) - dot(eq, yi, xi),
                dot(eq, yr, xi) + dot(eq, yi, xr),
            )

        # stage 1: DFT over axis f1
        cr0, ci0 = cmm("ka,bacd->bkcd", ar, ai, w1r, w1i)
        cr = cr0 * t1r - ci0 * t1i
        ci = cr0 * t1i + ci0 * t1r
        # stage 2: DFT over axis f2
        dr, di = cmm("kc,bxcd->bxkd", cr, ci, w2r, w2i)
        dr2 = dr * t2r - di * t2i
        di2 = dr * t2i + di * t2r
        # stage 3: DFT over axis f3
        er, ei = cmm("kd,bxcd->bxck", dr2, di2, w3r, w3i)
        p = jnp.square(er) + jnp.square(ei)
        return jnp.max(p.reshape(-1, n), axis=-1) / n

    run(
        "matmul 3f (8,16,16)",
        partial(gmax_3f2, f1=8, f2=16, f3=16),
    )
    run(
        "matmul 3f (2,32,32)",
        partial(gmax_3f2, f1=2, f2=32, f3=32),
    )

    # ---- stats roofline ----------------------------------------------------
    def bw_floor(i, q):
        return jnp.sum(i, axis=-1) + jnp.sum(q, axis=-1)

    run("bandwidth floor (sum only)", bw_floor, acc=False)

    def no_atan2(i, q):
        a2 = i * i + q * q
        a = jnp.sqrt(a2)
        cn = a / jnp.mean(a, axis=-1, keepdims=True) - 1.0
        return (
            jnp.sum(jnp.abs(cn), axis=-1)
            + jnp.sum(jnp.square(cn), axis=-1)
            + jnp.sum(a, axis=-1)
        )

    run("amplitude-only stats (no atan2)", no_atan2, acc=False)

    def full_stats(i, q):
        return jnp.sum(
            extract_features_planar(
                jnp.stack([i, q], axis=-2), compute_gmax=False
            ),
            axis=-1,
        )

    run("full extractor minus gmax", full_stats, acc=False)

    def full_matmul(i, q):
        return jnp.sum(
            extract_features_planar(
                jnp.stack([i, q], axis=-2), gmax_mode="matmul"
            ),
            axis=-1,
        )

    run("full extractor (current, matmul gmax)", full_matmul, acc=False)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
