"""Synthetic modulated-IQ dataset generator.

The reference ships no data generator — its dataset came from GNU Radio
captures / MATLAB (see ``/root/reference/old/read_binary_stream.py:19-75``
and ``README.md:62-73`` describing ``all_modulations.mat`` layout). This
module synthesizes an equivalent dataset natively: unit-power constellation
symbols + AWGN at each SNR level, WGN frames as the noise class, written in
the same ``.mat`` layout (variables ``signal_bpsk``..``signal_noise``, each
``(num_snr, num_frames, frame_size)`` complex).

Generation runs in JAX (threefry PRNG, batched over all frames of a
modulation at once) so producing the full default dataset — 96k frames of
2048 samples — takes seconds on any backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amcpy_tpu.config import Config

__all__ = ["generate_modulation", "generate_dataset", "write_dataset"]


def _constellation(name: str) -> np.ndarray:
    """Unit-average-power constellation points."""
    if name == "BPSK":
        return np.array([1.0, -1.0], dtype=np.complex128)
    if name == "QPSK":
        return np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
    if name == "8PSK":
        return np.exp(1j * (np.pi / 8 + np.pi / 4 * np.arange(8)))
    if name in ("16QAM", "QAM16"):
        lv = np.array([-3.0, -1.0, 1.0, 3.0])
        pts = (lv[:, None] + 1j * lv[None, :]).ravel()
        return pts / np.sqrt(np.mean(np.abs(pts) ** 2))
    if name in ("64QAM", "QAM64"):
        lv = np.arange(-7.0, 8.0, 2.0)
        pts = (lv[:, None] + 1j * lv[None, :]).ravel()
        return pts / np.sqrt(np.mean(np.abs(pts) ** 2))
    raise ValueError(f"unknown modulation {name!r}")


@partial(
    jax.jit,
    static_argnames=("num_frames", "frame_size", "num_points", "random_phase"),
)
def _gen_frames(
    key: jax.Array,
    points: jax.Array,  # (num_points, 2) planar float32 constellation
    snr_db: jax.Array,
    num_frames: int,
    frame_size: int,
    num_points: int,
    random_phase: bool,
) -> jax.Array:
    """(num_snr, num_frames, frame_size, 2) planar float32 frames per SNR.

    All device I/O is planar float32 — complex values exist only as (re,
    im) pairs because some PJRT backends cannot transfer complex arrays.
    """
    num_snr = snr_db.shape[0]
    k_sym, k_noise, k_phase = jax.random.split(key, 3)
    idx = jax.random.randint(
        k_sym, (num_snr, num_frames, frame_size), 0, num_points
    )
    sym_re = points[idx, 0]
    sym_im = points[idx, 1]
    if random_phase:
        ph = jax.random.uniform(
            k_phase, (num_snr, num_frames, 1), minval=0.0, maxval=2.0 * jnp.pi
        )
        c, s = jnp.cos(ph), jnp.sin(ph)
        sym_re, sym_im = sym_re * c - sym_im * s, sym_re * s + sym_im * c
    noise_pow = 10.0 ** (-snr_db / 10.0)
    sigma = jnp.sqrt(noise_pow / 2.0).astype(jnp.float32)[:, None, None]
    noise = jax.random.normal(
        k_noise, (num_snr, num_frames, frame_size, 2), dtype=jnp.float32
    )
    return jnp.stack(
        [sym_re + sigma * noise[..., 0], sym_im + sigma * noise[..., 1]],
        axis=-1,
    )


def generate_modulation(
    name: str,
    cfg: Config,
    seed: int,
) -> np.ndarray:
    """One modulation's frames: (num_snr, num_frames, frame_size) complex64."""
    s = cfg.signals
    key = jax.random.key(seed)
    if name == "WGN":
        # pure unit-power complex white noise, identical at every "SNR" level
        noise = _fetch_by_snr(
            jax.random.normal(
                key,
                (s.num_snr, s.num_frames, s.frame_size, 2),
                dtype=jnp.float32,
            )
        ) / np.sqrt(2.0)
        return (noise[..., 0] + 1j * noise[..., 1]).astype(np.complex64)
    pts_c = _constellation(name)
    pts = jnp.asarray(
        np.stack([pts_c.real, pts_c.imag], axis=-1), dtype=jnp.float32
    )
    snr = jnp.asarray(cfg.signals.snr_db, dtype=jnp.float32)
    planar = _fetch_by_snr(
        _gen_frames(
            key,
            pts,
            snr,
            s.num_frames,
            s.frame_size,
            int(pts.shape[0]),
            True,
        )
    )
    return (planar[..., 0] + 1j * planar[..., 1]).astype(np.complex64)


def _fetch_by_snr(dev_array) -> np.ndarray:
    """Device->host fetch in per-SNR slices (bit-identical to one fetch).

    The full default modulation is a 262 MB array; tunneled PJRT backends
    handle many ~16 MB transfers far more reliably than one giant one."""
    return np.concatenate(
        [np.asarray(dev_array[i])[None] for i in range(dev_array.shape[0])]
    )


def generate_dataset(cfg: Config, seed: int = 0) -> dict[str, np.ndarray]:
    """All modulations keyed by their .mat variable names."""
    out = {}
    for mi, mod in enumerate(cfg.signals.modulations_with_noise):
        out[cfg.signals.mat_info[mod]] = generate_modulation(
            mod, cfg, seed * 1000 + mi
        )
    return out


def write_dataset(cfg: Config, seed: int = 0) -> str:
    """Generate and write ``mat-data/all_modulations.mat``."""
    import scipy.io

    cfg.paths.ensure_dirs()
    path = cfg.paths.mat_data / cfg.paths.mat_filename
    scipy.io.savemat(str(path), generate_dataset(cfg, seed))
    return str(path)
