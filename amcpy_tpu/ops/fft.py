"""gamma_max spectral kernels — XLA FFT and a four-step MXU matmul-DFT.

Feature 1 is ``max |FFT(x)|^2 / N``. Only the *maximum* of the spectrum is
needed, which frees the algorithm choice: any output permutation works and
no bit-reversal/reordering is ever required.

``gmax_fft``     — XLA's native FFT (N log N on the VPU/scalar units).
``gmax_matmul``  — Cooley-Tukey four-step factorization N = N1 x N2 run as
two batched DFT matmuls + twiddle: N(N1+N2) complex MACs land on the MXU
systolic array instead of the FFT's VPU path. ~14x the FLOPs of an FFT at
N=2048 but the MXU has ~2 orders of magnitude more FLOP/s than the VPU
spends on XLA's FFT, so it wins wall-clock on TPU (bench-verified; see
bench.py).

All inputs planar float32; complex exists only inside the program.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gmax_fft", "gmax_matmul", "best_factorization"]


def gmax_fft(i: jax.Array, q: jax.Array) -> jax.Array:
    """max |FFT|^2 / N over the last axis via XLA's native FFT."""
    n = i.shape[-1]
    fft = jnp.fft.fft(jax.lax.complex(i, q), axis=-1)
    return (
        jnp.max(jnp.square(jnp.real(fft)) + jnp.square(jnp.imag(fft)), axis=-1)
        / n
    )


def best_factorization(
    n: int, multiple_of: int = 1
) -> tuple[int, int] | None:
    """Pick N1 x N2 = n for the two matmul stages.

    Bench-verified policy (TPU v5e, N=2048): a SMALL first factor with a
    large second factor wins — (8, 256) at 0.40 ms beats the
    MAC-count-minimizing (32, 64) at 0.435 ms and is more accurate — the
    long N2 axis keeps the second matmul's lane dimension wide. N2 is
    capped at 512 so the DFT table stays ~4 MB. None when n has no
    factorization with both factors >= 8.

    ``multiple_of`` — additionally require ``n1 % multiple_of == 0`` (the
    sequence-parallel distributed DFT needs n1 divisible by the seq-axis
    size so each shard owns whole stage-1 row blocks, ``parallel/sp.py``);
    preference order is otherwise unchanged. Returns None if no
    factorization satisfies it — callers fall back to ``multiple_of=1``.
    """
    start = max(8, -(-n // 512))  # smallest n1 with n2 = n/n1 <= 512
    # unconstrained search keeps n1 <= sqrt(n) (small-first-factor
    # policy); a divisibility constraint may only be satisfiable by an
    # n1 ABOVE sqrt(n) (e.g. n=242, multiple_of=2 -> (22, 11)), so the
    # constrained search extends to every n1 with cofactor >= 8
    limit = n // 8 if multiple_of > 1 else int(np.sqrt(n))
    for lo in (start, 8):  # prefer n2 <= 512; then any with both >= 8
        for n1 in range(lo, limit + 1):
            if (
                n % n1 == 0
                and n // n1 >= 8
                and n1 % multiple_of == 0
            ):
                return (n1, n // n1)
    return None


@lru_cache(maxsize=16)
def _dft_tables(n1: int, n2: int) -> tuple[np.ndarray, ...]:
    """(DFT_N1 re/im, twiddle re/im, DFT_N2 re/im) as float32 constants."""
    n = n1 * n2
    k1 = np.arange(n1)
    w1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    k2 = np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n)  # W_N^{k1*n2}
    return (
        w1.real.astype(np.float32), w1.imag.astype(np.float32),
        tw.real.astype(np.float32), tw.imag.astype(np.float32),
        w2.real.astype(np.float32), w2.imag.astype(np.float32),
    )


@partial(jax.jit, static_argnames=("n1", "n2"))
def _gmax_matmul_impl(
    i: jax.Array, q: jax.Array, n1: int, n2: int
) -> jax.Array:
    n = n1 * n2
    w1r, w1i, twr, twi, w2r, w2i = (
        jnp.asarray(t) for t in _dft_tables(n1, n2)
    )
    lead = i.shape[:-1]
    ar = i.reshape(*lead, n1, n2)  # sample n = n1*N2 + n2
    ai = q.reshape(*lead, n1, n2)

    def cmm(xr, xi, yr, yi, eq):
        """complex matmul via 4 real einsums with f32 accumulation."""
        dot = partial(jnp.einsum, eq, preferred_element_type=jnp.float32)
        return (
            dot(yr, xr) - dot(yi, xi),
            dot(yr, xi) + dot(yi, xr),
        )

    # step 1: length-N1 DFT down the first factor (matmul on the MXU)
    cr, ci = cmm(ar, ai, w1r, w1i, "kn,...nm->...km")
    # step 2: twiddle
    cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
    # step 3: length-N2 DFT along the second factor
    xr = (
        jnp.einsum("...km,ml->...kl", cr, w2r,
                   preferred_element_type=jnp.float32)
        - jnp.einsum("...km,ml->...kl", ci, w2i,
                     preferred_element_type=jnp.float32)
    )
    xi = (
        jnp.einsum("...km,ml->...kl", cr, w2i,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("...km,ml->...kl", ci, w2r,
                     preferred_element_type=jnp.float32)
    )
    power = jnp.square(xr) + jnp.square(xi)
    return jnp.max(power.reshape(*lead, n), axis=-1) / n


def gmax_matmul(i: jax.Array, q: jax.Array) -> jax.Array:
    """max |DFT|^2 / N via the four-step MXU factorization; falls back to
    the FFT when the frame size has no usable factorization."""
    n = i.shape[-1]
    fac = best_factorization(n)
    if fac is None:
        return gmax_fft(i, q)
    return _gmax_matmul_impl(i, q, fac[0], fac[1])
