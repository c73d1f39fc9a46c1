"""Full-fusion Pallas kernel: stats (VPU) + matmul-DFT gamma_max (MXU) in
ONE VMEM pass.

The round-2 extractor read the raw I/Q once for the fused statistics and
again for the spectral kernel, and XLA executes the two programs
sequentially — the MXU idles during the VPU-bound statistics and vice
versa (measured additive: stats 0.085 ms + DFT 0.033 ms at 1024x2048).
Here one Pallas grid step loads a ``(TILE_B, N)`` block of each I/Q plane
into VMEM exactly once and computes

* all 17 statistical features on the VPU (Cephes atan2, wrapped-diff
  instantaneous frequency, single-pass moment accumulation — the same
  conformance-tested numerics as :mod:`amcpy_tpu.ops.pallas_features`), and
* gamma_max via the two-stage matmul-DFT: stage 1 (length-N1 DFT, tiny)
  unrolled on the VPU over lane-aligned column blocks — no reshape, no
  relayout — and stage 2 (length-N2 DFT) as ``jax.lax.dot_general`` calls
  that Mosaic schedules on the MXU CONCURRENTLY with the VPU statistics.

Inputs are separate I and Q planes ``(B, N)`` — the native (8, 128)-tiled
layout. The packed ``(B, 2, N)`` interface of the other kernels tiles its
trailing ``(2, N)`` dims, wasting 3/4 of the sublanes in every block load
(measured 2x on the round-2 Pallas kernel).

Reference semantics: /root/reference/src/amcpy/features.py:66-211 (18
features), feature_extraction.py:22-99 (the per-frame hot path this
replaces).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amcpy_tpu.ops.features import NUM_FEATURES
from amcpy_tpu.ops.fft import _dft_tables, best_factorization
from amcpy_tpu.ops.pallas_features import _atan2

__all__ = ["extract_features_fused", "split_planes"]

_PI = np.pi
_TWO_PI = 2.0 * np.pi


def _stats_block(i, q, n, normalize_scale):
    """17 statistical features of one (TILE_B, N) I/Q block — identical
    numerics to pallas_features._kernel (conformance-tested there)."""
    a2_raw = i * i + q * q
    a_raw = jnp.sqrt(a2_raw)
    phase = _atan2(q, i)
    abs_phase = jnp.abs(phase)

    mean_a = jnp.mean(a_raw, axis=-1, keepdims=True)
    cn = a_raw / mean_a - 1.0

    def std1(v):
        m = jnp.mean(v, axis=-1, keepdims=True)
        return jnp.sqrt(jnp.sum(jnp.square(v - m), axis=-1) / (n - 1))

    f2 = std1(abs_phase)
    f3 = std1(phase)
    f4 = std1(jnp.abs(cn))
    f6 = mean_a[:, 0]
    f7 = jnp.sqrt(jnp.sum(a_raw, axis=-1)) / n

    cn_m = jnp.mean(cn, axis=-1, keepdims=True)
    cn_c = cn - cn_m
    cn_c2 = jnp.square(cn_c)
    cn_m2 = jnp.mean(cn_c2, axis=-1)
    cn_m4 = jnp.mean(jnp.square(cn_c2), axis=-1)
    f8 = cn_m4 / jnp.square(cn_m2)

    # instantaneous frequency: roll + tail mask (no (N-1) intermediates)
    nxt = pltpu.roll(phase, shift=n - 1, axis=1)  # left-rotate by 1
    d = nxt - phase
    w = jnp.mod(d + _PI, _TWO_PI) - _PI
    w = jnp.where((w == -_PI) & (d > 0), _PI, w)
    w = w / _TWO_PI
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < n - 1
    ).astype(w.dtype)
    n_f = n - 1
    wm = w * mask
    f_mu = jnp.sum(wm, axis=-1, keepdims=True) / n_f
    f_c = (w - f_mu) * mask
    f_c2 = jnp.square(f_c)
    f_m2 = jnp.sum(f_c2, axis=-1) / n_f
    f_m4 = jnp.sum(jnp.square(f_c2), axis=-1) / n_f
    f5 = jnp.sqrt(f_m2 * n_f / (n_f - 1))
    f9 = f_m4 / jnp.square(f_m2)

    if normalize_scale:
        s = jnp.max(a_raw, axis=-1)
        s = jnp.where(s > 0, s, jnp.ones_like(s))
        inv = (1.0 / s)[:, None]
        iu = i * inv
        qu = q * inv
        a2 = a2_raw * jnp.square(inv)
    else:
        s = jnp.ones_like(f6)
        iu, qu, a2 = i, q, a2_raw

    x2r = iu * iu - qu * qu
    x2i = 2.0 * iu * qu
    x4r = x2r * x2r - x2i * x2i
    x4i = 2.0 * x2r * x2i
    x6r = x4r * x2r - x4i * x2i
    x6i = x4r * x2i + x4i * x2r
    a4 = a2 * a2

    def mean(v):
        return jnp.mean(v, axis=-1)

    m20r, m20i = mean(x2r), mean(x2i)
    m21 = mean(a2)
    m40r, m40i = mean(x4r), mean(x4i)
    m41r, m41i = mean(x2r * a2), mean(x2i * a2)
    m42 = mean(a4)
    m60r, m60i = mean(x6r), mean(x6i)
    m61r, m61i = mean(x4r * a2), mean(x4i * a2)
    m62 = mean(x2r * a4)
    m63 = mean(a2 * a4)

    def cabs(re, im):
        return jnp.sqrt(re * re + im * im)

    c20 = cabs(m20r, m20i)
    c21 = jnp.abs(m21)
    m20sq_r = m20r * m20r - m20i * m20i
    m20sq_i = 2.0 * m20r * m20i
    c40 = cabs(m40r - 3.0 * m20sq_r, m40i - 3.0 * m20sq_i)
    c41 = cabs(m41r - 3.0 * m20r * m21, m41i - 3.0 * m20i * m21)
    c42 = jnp.abs(m42 - (m20r * m20r + m20i * m20i) - 2.0 * m21 * m21)
    m20cu_r = m20sq_r * m20r - m20sq_i * m20i
    m20cu_i = m20sq_r * m20i + m20sq_i * m20r
    m2040_r = m20r * m40r - m20i * m40i
    m2040_i = m20r * m40i + m20i * m40r
    c60 = cabs(
        m60r - 15.0 * m2040_r + 3.0 * m20cu_r,
        m60i - 15.0 * m2040_i + 3.0 * m20cu_i,
    )
    m2041_r = m20r * m41r - m20i * m41i
    m2041_i = m20r * m41i + m20i * m41r
    c61 = cabs(
        m61r - 5.0 * m21 * m40r - 10.0 * m2041_r + 30.0 * m20sq_r * m21,
        m61i - 5.0 * m21 * m40i - 10.0 * m2041_i + 30.0 * m20sq_i * m21,
    )
    m2240_r = m20r * m40r + m20i * m40i
    m2240_i = m20r * m40i - m20i * m40r
    m20sq_m22_r = m20sq_r * m20r + m20sq_i * m20i
    m20sq_m22_i = -m20sq_r * m20i + m20sq_i * m20r
    c62 = cabs(
        m62 - 6.0 * m20r * m42 - 8.0 * m21 * m41r - m2240_r
        + 6.0 * m20sq_m22_r + 24.0 * m21 * m21 * m20r,
        -6.0 * m20i * m42 - 8.0 * m21 * m41i - m2240_i
        + 6.0 * m20sq_m22_i + 24.0 * m21 * m21 * m20i,
    )
    m2043_r = m20r * m41r + m20i * m41i
    m2043_i = -m20r * m41i + m20i * m41r
    m2241_r = m20r * m41r + m20i * m41i
    m2241_i = m20r * m41i - m20i * m41r
    m20_abs2 = m20r * m20r + m20i * m20i
    c63 = cabs(
        m63 - 9.0 * m21 * m42 + 12.0 * m21 * m21 * m21
        - 3.0 * m2043_r - 3.0 * m2241_r + 18.0 * m21 * m20_abs2,
        -3.0 * m2043_i - 3.0 * m2241_i,
    )

    if normalize_scale:
        s2 = s * s
        s4 = s2 * s2
        s6 = s4 * s2
        c20, c21 = c20 * s2, c21 * s2
        c40, c41, c42 = c40 * s4, c41 * s4, c42 * s4
        c60, c61, c62, c63 = c60 * s6, c61 * s6, c62 * s6, c63 * s6

    return (
        f2, f3, f4, f5, f6, f7, f8, f9,
        c20, c21, c40, c41, c42, c60, c61, c62, c63,
    )


def split_planes(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side complex ``(B, N)`` -> two contiguous float32 ``(B, N)``
    planes — the fused kernel's native input layout."""
    frames = np.asarray(frames)
    return (
        np.ascontiguousarray(frames.real, dtype=np.float32),
        np.ascontiguousarray(frames.imag, dtype=np.float32),
    )


@partial(
    jax.jit,
    static_argnames=("normalize_scale", "tile_b", "interpret", "precision"),
)
def extract_features_fused(
    i: jax.Array,
    q: jax.Array,
    *,
    normalize_scale: bool = True,
    tile_b: int = 64,
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """All 18 features from separate I/Q planes ``(B, N)`` in one fused
    VMEM pass. Returns ``(B, 18)`` float32.

    ``precision`` sets the stage-2 MXU DFT precision ('default' = bf16
    multiplies with f32 accumulation — within the framework's f1 error
    budget of 1e-4 * sum|x|^2 (PARITY tolerance model); 'highest' = full
    f32 via multi-pass). Falls back to raising if N has no N1 x N2
    factorization — callers route those shapes to the XLA kernels.
    """
    b, n = i.shape
    fac = best_factorization(n)
    if fac is None:
        raise ValueError(f"frame size {n} has no N1 x N2 factorization")
    n1, n2 = fac
    tile_b = min(tile_b, max(b, 8))
    pad = (-b) % tile_b
    if pad:
        i = jnp.concatenate([i, jnp.repeat(i[-1:], pad, axis=0)])
        q = jnp.concatenate([q, jnp.repeat(q[-1:], pad, axis=0)])
    bp = b + pad

    # w1 is tiny (N1 x N1): embed as python constants in the unrolled
    # stage-1 loop. The larger tables ride in VMEM as kernel inputs.
    w1r, w1i, twr, twi, w2r, w2i = _dft_tables(n1, n2)

    tab_specs = [
        pl.BlockSpec(t.shape, lambda g: (0,) * t.ndim, memory_space=pltpu.VMEM)
        for t in (twr, twi, w2r, w2i)
    ]
    kernel = partial(
        _fused_kernel_entry,
        n=n, n1=n1, n2=n2,
        w1r=w1r, w1i=w1i,
        normalize_scale=normalize_scale,
        precision=precision,
    )
    feats = pl.pallas_call(
        kernel,
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, n), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n), lambda g: (g, 0), memory_space=pltpu.VMEM),
            *tab_specs,
        ],
        out_specs=pl.BlockSpec(
            (tile_b, NUM_FEATURES), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, NUM_FEATURES), jnp.float32),
        interpret=interpret,
    )(
        i, q,
        jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(w2r), jnp.asarray(w2i),
    )
    return feats[:b]


def _fused_kernel_entry(
    i_ref, q_ref, twr_ref, twi_ref, w2r_ref, w2i_ref, out_ref,
    *, n, n1, n2, w1r, w1i, normalize_scale, precision,
):
    i = i_ref[:]
    q = q_ref[:]
    stats = _stats_block(i, q, n, normalize_scale)

    twr = twr_ref[:]
    twi = twi_ref[:]
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    gm = None
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    for k1 in range(n1):
        cr = None
        ci = None
        for j in range(n1):
            ij = i[:, j * n2 : (j + 1) * n2]
            qj = q[:, j * n2 : (j + 1) * n2]
            wr = float(w1r[k1, j])
            wi = float(w1i[k1, j])
            tr = None
            if wr != 0.0:
                tr = ij if wr == 1.0 else (-ij if wr == -1.0 else ij * wr)
            if wi != 0.0:
                term = qj if wi == 1.0 else (-qj if wi == -1.0 else qj * wi)
                tr = (tr - term) if tr is not None else -term
            ti = None
            if wr != 0.0:
                ti = qj if wr == 1.0 else (-qj if wr == -1.0 else qj * wr)
            if wi != 0.0:
                term = ij if wi == 1.0 else (-ij if wi == -1.0 else ij * wi)
                ti = (ti + term) if ti is not None else term
            cr = tr if cr is None else (cr + tr)
            ci = ti if ci is None else (ci + ti)
        dr = cr * twr[k1] - ci * twi[k1]
        di = cr * twi[k1] + ci * twr[k1]
        xr = dot(dr, w2r) - dot(di, w2i)
        xi = dot(dr, w2i) + dot(di, w2r)
        p = xr * xr + xi * xi
        m = jnp.max(p, axis=-1)
        gm = m if gm is None else jnp.maximum(gm, m)
    f1 = gm / n

    out_ref[:, :] = jnp.stack((f1,) + stats, axis=-1)
