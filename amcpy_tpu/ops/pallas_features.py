"""Pallas fused feature kernel — single-VMEM-pass moment/statistics core.

One Pallas grid step loads a ``(TILE_B, 2, N)`` block of planar I/Q frames
into VMEM and produces all 17 non-FFT features for those frames without
touching HBM again: amplitude/phase streams, wrapped-difference
instantaneous frequency (via ``pltpu.roll`` + tail mask — no unaligned
(N-1)-length intermediates), the 11 mixed moments, and the cumulant
assembly, all fused into one kernel. gamma_max keeps XLA's native FFT
(a Pallas FFT would be an N^2 DFT matmul — strictly worse than XLA's
N log N) and is fused in by the wrapper.

This mirrors the pure-XLA path in :mod:`amcpy_tpu.ops.features` (same
numerics, same conformance tests); both are kept because XLA's fusion of
this pipeline is already near the VPU roofline — the benchmark
(`bench.py`) picks the faster path per shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amcpy_tpu.ops.features import NUM_FEATURES

__all__ = ["extract_features_pallas"]

_PI = np.pi
_TWO_PI = 2.0 * np.pi


def _atan_pos(x: jax.Array) -> jax.Array:
    """atan for x >= 0 — Cephes-style octant reduction + degree-9 minimax
    polynomial (float32 accurate to ~1 ulp). Mosaic has no atan2 lowering,
    so the kernel carries its own."""
    big = x > 2.414213562373095  # tan(3pi/8)
    mid = x > 0.414213562373095  # tan(pi/8)
    safe_x = jnp.where(x == 0, 1.0, x)
    z = jnp.where(
        big, -1.0 / safe_x, jnp.where(mid, (x - 1.0) / (x + 1.0), x)
    )
    y0 = jnp.where(
        big,
        jnp.float32(np.pi / 2),
        jnp.where(mid, jnp.float32(np.pi / 4), 0.0),
    )
    t = z * z
    p = (
        ((8.05374449538e-2 * t - 1.38776856032e-1) * t + 1.99777106478e-1)
        * t
        - 3.33329491539e-1
    ) * t * z + z
    return y0 + p


def _atan2(y: jax.Array, x: jax.Array) -> jax.Array:
    """Full four-quadrant atan2(y, x) from :func:`_atan_pos`; matches
    ``np.angle`` conventions (angle(0+0j) = 0, angle(-r+0j) = +pi)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    denom = jnp.where(ax == 0, 1.0, ax)
    ratio = jnp.where(ax == 0, jnp.float32(np.inf), ay / denom)
    r = _atan_pos(jnp.where((ax == 0) & (ay == 0), 0.0, ratio))
    r = jnp.where((ax == 0) & (ay == 0), 0.0, r)
    ang = jnp.where(x >= 0, r, jnp.float32(np.pi) - r)
    return jnp.where(y < 0, -ang, ang)


def _kernel(iq_ref, out_ref, *, n: int, normalize_scale: bool):
    i = iq_ref[:, 0, :]
    q = iq_ref[:, 1, :]

    # ---- amplitude / phase streams --------------------------------------
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

    # ---- instantaneous frequency: roll + tail mask ----------------------
    # d[k] = phase[k+1] - phase[k] for k < n-1; the rolled tail entry wraps
    # to phase[0]-phase[n-1] and is masked out of every statistic.
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

    # ---- scale normalization --------------------------------------------
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

    # ---- moments (planar complex arithmetic) ----------------------------
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

    # ---- cumulants in explicit (re, im) arithmetic ----------------------
    def cabs(re, im):
        return jnp.sqrt(re * re + im * im)

    c20 = cabs(m20r, m20i)
    c21 = jnp.abs(m21)
    # m20^2
    m20sq_r = m20r * m20r - m20i * m20i
    m20sq_i = 2.0 * m20r * m20i
    c40 = cabs(m40r - 3.0 * m20sq_r, m40i - 3.0 * m20sq_i)
    c41 = cabs(m41r - 3.0 * m20r * m21, m41i - 3.0 * m20i * m21)
    c42 = jnp.abs(m42 - (m20r * m20r + m20i * m20i) - 2.0 * m21 * m21)
    # m20^3 = m20^2 * m20 ; m20*m40
    m20cu_r = m20sq_r * m20r - m20sq_i * m20i
    m20cu_i = m20sq_r * m20i + m20sq_i * m20r
    m2040_r = m20r * m40r - m20i * m40i
    m2040_i = m20r * m40i + m20i * m40r
    c60 = cabs(
        m60r - 15.0 * m2040_r + 3.0 * m20cu_r,
        m60i - 15.0 * m2040_i + 3.0 * m20cu_i,
    )
    # m20*m41
    m2041_r = m20r * m41r - m20i * m41i
    m2041_i = m20r * m41i + m20i * m41r
    c61 = cabs(
        m61r - 5.0 * m21 * m40r - 10.0 * m2041_r + 30.0 * m20sq_r * m21,
        m61i - 5.0 * m21 * m40i - 10.0 * m2041_i + 30.0 * m20sq_i * m21,
    )
    # m22 = conj(m20): m22*m40 ; m20^2*m22 = m20^2*conj(m20)
    m2240_r = m20r * m40r + m20i * m40i
    m2240_i = m20r * m40i - m20i * m40r
    m20sq_m22_r = m20sq_r * m20r + m20sq_i * m20i
    m20sq_m22_i = -m20sq_r * m20i + m20sq_i * m20r
    # m21 real => m21*m41 scales components
    c62 = cabs(
        m62 - 6.0 * m20r * m42 - 8.0 * m21 * m41r - m2240_r
        + 6.0 * m20sq_m22_r + 24.0 * m21 * m21 * m20r,
        -6.0 * m20i * m42 - 8.0 * m21 * m41i - m2240_i
        + 6.0 * m20sq_m22_i + 24.0 * m21 * m21 * m20i,
    )
    # m43 = conj(m41): m20*m43 ; m22*m41 = conj(m20)*m41 ;
    # m20*m21*m22 = m21*|m20|^2 (real)
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

    # ---- un-normalization ------------------------------------------------
    if normalize_scale:
        s2 = s * s
        s4 = s2 * s2
        s6 = s4 * s2
        c20, c21 = c20 * s2, c21 * s2
        c40, c41, c42 = c40 * s4, c41 * s4, c42 * s4
        c60, c61, c62, c63 = c60 * s6, c61 * s6, c62 * s6, c63 * s6

    f1 = jnp.zeros_like(f6)  # gamma_max filled by the XLA FFT epilogue
    out_ref[:, :] = jnp.stack(
        [
            f1, f2, f3, f4, f5, f6, f7, f8, f9,
            c20, c21, c40, c41, c42, c60, c61, c62, c63,
        ],
        axis=-1,
    )


@partial(
    jax.jit,
    static_argnames=(
        "normalize_scale", "compute_gmax", "tile_b", "interpret", "gmax_mode"
    ),
)
def extract_features_pallas(
    iq: jax.Array,
    *,
    normalize_scale: bool = True,
    compute_gmax: bool = True,
    tile_b: int = 32,
    interpret: bool = False,
    gmax_mode: str = "fft",
) -> jax.Array:
    """All 18 features via the fused Pallas kernel (+ XLA spectral epilogue
    for f1 — ``gmax_mode`` picks the FFT or the four-step MXU matmul-DFT).

    ``iq``: (B, 2, N) planar float32. B is padded to ``tile_b`` internally.
    """
    b, two, n = iq.shape
    if two != 2:
        raise ValueError(f"expected (B, 2, N), got {iq.shape}")
    pad = (-b) % tile_b
    if pad:
        iq = jnp.concatenate([iq, iq[-1:].repeat(pad, axis=0)], axis=0)
    bp = b + pad

    feats = pl.pallas_call(
        partial(_kernel, n=n, normalize_scale=normalize_scale),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec(
                (tile_b, 2, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (tile_b, NUM_FEATURES), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, NUM_FEATURES), iq.dtype),
        interpret=interpret,
    )(iq)

    if compute_gmax:
        # Spectral epilogue (XLA native) — gmax_mode picks the four-step
        # MXU matmul-DFT or the FFT, exactly as in the XLA path. Raw i/q:
        # the DFT is linear, so scale normalization buys nothing and would
        # only materialize normalized temporaries (see ops/features.py).
        from amcpy_tpu.ops import fft as _fft

        spectral = _fft.gmax_matmul if gmax_mode == "matmul" else _fft.gmax_fft
        gmax = spectral(iq[:, 0, :], iq[:, 1, :])
        feats = feats.at[:, 0].set(gmax)

    return feats[:b]
