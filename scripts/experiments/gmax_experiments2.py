"""Round-2 gmax experiments: block-complex shapes x precisions, and the
bf16-locate + exact-refine scheme. Same measurement protocol as round 1.

Usage:  python -u scripts/gmax_experiments2.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

BATCH = int(os.environ.get("GMAX_BATCH", 4096))
N = int(os.environ.get("GMAX_N", 2048))
ITERS = int(os.environ.get("GMAX_ITERS", 30))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/amcpy_jax")
    from amcpy_tpu.ops.features import extract_features_planar

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    log(f"first-sync: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, N)) + 1j * rng.standard_normal((BATCH, N))
    # make a slice of frames spectrally concentrated (near-tones) — the
    # regime where bf16 bin power is most damaging
    k = np.arange(N)
    for bi in range(0, BATCH, 16):
        f0 = rng.uniform(0, N)
        x[bi] = 40.0 * np.exp(2j * np.pi * f0 * k / N) + x[bi]
    gmax_ref = np.max(np.abs(np.fft.fft(x, axis=-1)) ** 2, axis=-1) / N
    ij = jax.device_put(x.real.astype(np.float32), dev)
    qj = jax.device_put(x.imag.astype(np.float32), dev)

    def timeit(fn):
        def repeated(i, q, iters):
            def body(kk, acc):
                r = fn(i + kk * jnp.float32(1e-12), q)
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
        log(f"{name:46s} {dt * 1e3:7.3f} ms   relerr {err:.2e}")

    P = jax.lax.Precision

    def block_power(i, q, n1, n2, prec):
        """Power spectrum (B, n1, n2) via block-complex two-stage DFT."""
        n = n1 * n2
        k1, k2 = np.arange(n1), np.arange(n2)
        w1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
        w2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
        tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)
        wb1 = np.block(
            [[w1.real, -w1.imag], [w1.imag, w1.real]]
        ).astype(np.float32)
        wb2 = np.block(
            [[w2.real, w2.imag], [-w2.imag, w2.real]]
        ).astype(np.float32)
        twr = jnp.float32(tw.real)
        twi = jnp.float32(tw.imag)
        dot = partial(
            jnp.einsum, precision=prec, preferred_element_type=jnp.float32
        )
        ar = i.reshape(-1, n1, n2)
        ai = q.reshape(-1, n1, n2)
        a = jnp.concatenate([ar, ai], axis=1)
        c = dot("kn,bnm->bkm", jnp.asarray(wb1), a)
        cr, ci = c[:, :n1], c[:, n1:]
        cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
        cc = jnp.concatenate([cr, ci], axis=2)
        xx = dot("bkm,ml->bkl", cc, jnp.asarray(wb2))
        xr, xi = xx[..., :n2], xx[..., n2:]
        return jnp.square(xr) + jnp.square(xi)

    def gmax_block(i, q, n1, n2, prec=P.DEFAULT):
        p = block_power(i, q, n1, n2, prec)
        return jnp.max(p.reshape(i.shape[0], -1), axis=-1) / (n1 * n2)

    for n1, n2 in [(16, 128), (32, 64), (64, 32), (8, 256)]:
        run(
            f"block ({n1},{n2}) default",
            partial(gmax_block, n1=n1, n2=n2),
        )
    run(
        "block (16,128) bf16_3x",
        partial(gmax_block, n1=16, n2=128, prec="bfloat16_3x"),
    )
    run(
        "block (32,64) bf16_3x",
        partial(gmax_block, n1=32, n2=64, prec="bfloat16_3x"),
    )
    run(
        "block (16,128) highest",
        partial(gmax_block, n1=16, n2=128, prec=P.HIGHEST),
    )

    # ---- locate (bf16) + exact refine (f32 VPU dot at the peak bin) -----
    def gmax_refined(i, q, n1, n2, prec=P.DEFAULT, topk=1):
        b, n = i.shape[0], n1 * n2
        p = block_power(i, q, n1, n2, prec)
        # four-step output at (k1, k2) is spectrum bin k = k2*n1 + k1?
        # X[k1, k2] = sum ... — bin index is k1*?  For the standard
        # decimation used here (sample index a = a1*n2 + a2), the output
        # (k1, k2) corresponds to frequency k = k1 + n1*k2.
        pf = p.reshape(b, -1)  # flat index j = k1*n2 + k2
        if topk == 1:
            j = jnp.argmax(pf, axis=-1)
            cand = j[:, None]  # (B, 1)
        else:
            _, cand = jax.lax.top_k(pf, topk)  # (B, topk)
        k1 = cand // n2
        k2 = cand % n2
        freq = (k1 + n1 * k2).astype(jnp.float32)  # (B, topk)
        # exact DFT at the candidate bins: X = sum_n x[n] e^{-2pi i f n/N}
        nn = jnp.arange(n, dtype=jnp.float32)
        # phase = -2pi * mod(f*n, N) / N  (f*n up to N^2=4.2e6 < 2^24: exact)
        fn = freq[..., None] * nn  # (B, topk, N)
        ph = (-2.0 * np.pi / n) * jnp.mod(fn, jnp.float32(n))
        cr = jnp.cos(ph)
        ci = jnp.sin(ph)
        xr = jnp.sum(i[:, None, :] * cr - q[:, None, :] * ci, axis=-1)
        xi = jnp.sum(i[:, None, :] * ci + q[:, None, :] * cr, axis=-1)
        return jnp.max(jnp.square(xr) + jnp.square(xi), axis=-1) / n

    run(
        "block (16,128) + exact refine top1",
        partial(gmax_refined, n1=16, n2=128),
    )
    run(
        "block (16,128) + exact refine top2",
        partial(gmax_refined, n1=16, n2=128, topk=2),
    )
    run(
        "block (32,64) + exact refine top1",
        partial(gmax_refined, n1=32, n2=64),
    )

    # ---- full extractor with each gmax candidate fused ------------------
    def full_with(gfn):
        def f(i, q):
            iq = jnp.stack([i, q], axis=-2)
            feats = extract_features_planar(iq, compute_gmax=False)
            s = jnp.max(jnp.sqrt(i * i + q * q), axis=-1)
            s = jnp.where(s > 0, s, jnp.ones_like(s))
            inv = (1.0 / s)[:, None]
            g = gfn(i * inv, q * inv) * (s * s)
            return jnp.sum(feats, axis=-1) + g

        return f

    run(
        "FULL extractor + block(16,128) refine top1",
        full_with(partial(gmax_refined, n1=16, n2=128)),
        acc=False,
    )
    run(
        "FULL extractor + block(16,128) default",
        full_with(partial(gmax_block, n1=16, n2=128)),
        acc=False,
    )
    run(
        "FULL extractor (current matmul) [control]",
        lambda i, q: jnp.sum(
            extract_features_planar(
                jnp.stack([i, q], axis=-2), gmax_mode="matmul"
            ),
            axis=-1,
        ),
        acc=False,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
