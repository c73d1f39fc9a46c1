"""ctypes binding for the native host-IO library (``native/amc_io.cc``).

Builds ``libamc_io.so`` on demand with g++ (cached next to the source) and
exposes NumPy-friendly wrappers. Every entry point has a NumPy fallback so
the framework works identically when no compiler is available — the native
path is a host-side throughput optimization (multi-threaded planarize /
stream framing), not a functional dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = [
    "available",
    "planarize",
    "deplanarize",
    "read_stream_frames",
    "standardize",
]

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "amc_io.cc"
_LIB = _NATIVE_DIR / "libamc_io.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_F32P = ctypes.POINTER(ctypes.c_float)


def _build() -> bool:
    if not _SRC.exists():
        return False
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AMCPY_NO_NATIVE"):
            return None
        if not _LIB.exists() or (
            _SRC.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.amc_planarize.argtypes = [
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int64
        ]
        lib.amc_deplanarize.argtypes = [
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int64
        ]
        lib.amc_read_stream_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _F32P,
        ]
        lib.amc_read_stream_frames.restype = ctypes.c_int64
        lib.amc_standardize.argtypes = [
            _F32P, _F32P, _F32P, _F32P, ctypes.c_int64, ctypes.c_int64
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def planarize(frames: np.ndarray) -> np.ndarray:
    """Complex64 ``(..., N)`` -> planar float32 ``(..., 2, N)``.

    Native multi-threaded deinterleave when built; NumPy otherwise.
    """
    frames = np.ascontiguousarray(frames, dtype=np.complex64)
    lead = frames.shape[:-1]
    n = frames.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    lib = _load()
    if lib is None:
        from amcpy_tpu.ops.features import to_planar

        return to_planar(frames)
    flat = frames.reshape(b, n)
    out = np.empty((b, 2, n), dtype=np.float32)
    lib.amc_planarize(
        flat.view(np.float32).ctypes.data_as(_F32P), _ptr(out), b, n
    )
    return out.reshape(*lead, 2, n)


def deplanarize(planar: np.ndarray) -> np.ndarray:
    """Planar float32 ``(..., 2, N)`` -> complex64 ``(..., N)``."""
    planar = np.ascontiguousarray(planar, dtype=np.float32)
    lead = planar.shape[:-2]
    n = planar.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    lib = _load()
    if lib is None:
        return (planar[..., 0, :] + 1j * planar[..., 1, :]).astype(
            np.complex64
        )
    out = np.empty((b, n), dtype=np.complex64)
    lib.amc_deplanarize(
        _ptr(planar.reshape(b, 2, n)),
        out.view(np.float32).ctypes.data_as(_F32P),
        b,
        n,
    )
    return out.reshape(*lead, n)


def read_stream_frames(
    path: str | Path,
    frame_size: int,
    *,
    skip: int = 2400,
    max_frames: int | None = None,
) -> np.ndarray:
    """GNU Radio complex64 capture -> planar ``(frames, 2, frame_size)``.

    Fused read + deinterleave (native) or NumPy fallback.
    """
    path = Path(path)
    if max_frames is None:
        total = path.stat().st_size // 8  # complex64
        max_frames = max((total - skip) // frame_size, 0)
    lib = _load()
    if lib is None:
        from amcpy_tpu.data.legacy import frame_stream, read_gnuradio_stream
        from amcpy_tpu.ops.features import to_planar

        # Bounded read: only the window this call frames, never the whole
        # remaining capture (O(total^2) for chunked multi-GB streams).
        stream = read_gnuradio_stream(
            path, skip=skip, limit=max_frames * frame_size
        )
        return to_planar(frame_stream(stream, frame_size, max_frames))
    out = np.empty((max_frames, 2, frame_size), dtype=np.float32)
    got = lib.amc_read_stream_frames(
        str(path).encode(), skip, frame_size, max_frames, _ptr(out)
    )
    if got < 0:
        raise IOError(f"failed to read {path}")
    return out[:got]


def standardize(
    x: np.ndarray, mean: np.ndarray, std: np.ndarray
) -> np.ndarray:
    """Fused ``(x - mean) / std`` (native threads or NumPy)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    lib = _load()
    if lib is None:
        return (x - mean) / std
    out = np.empty_like(x)
    rows = int(np.prod(x.shape[:-1]))
    lib.amc_standardize(
        _ptr(x), _ptr(mean), _ptr(std), _ptr(out), rows, x.shape[-1]
    )
    return out
