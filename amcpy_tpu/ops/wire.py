"""Host->device wire codecs for planar IQ frames.

The end-to-end extraction flow is WIRE-bound on tunneled PJRT backends
(~28-44 MB/s aggregate over concurrent streams — PROFILE_r4_hostpath.md),
so bytes-on-the-wire is the end-to-end lever. These codecs quantize each
f32 sample to a block-floating-point integer against a per-frame scale on
the HOST, ship the narrow integers, and dequantize ON DEVICE in the same
jitted program as the feature kernel:

* ``int24`` — 3 bytes/sample (int16 high + uint8 low, shared per-frame
  f32 scale): 25% fewer wire bytes than f32. Worst-case per-sample error
  is ``frame_max * 2^-23`` — the same order as f32's own representation
  error, ~100x inside the extraction parity budget (gating experiment:
  ``scripts/wire_gate.py``).
* ``int16`` — 2 bytes/sample: 50% fewer bytes, worst-case error
  ``frame_max * 2^-15``. Round 4 measured plain int16/f16 at ~2-5x the
  parity tolerance on the x^6 moments; kept for the gating experiment's
  negative arm and for tolerance-insensitive pipelines.
* ``f32`` — identity (no codec).

The reference has no equivalent stage (its "wire" is the filesystem,
``/root/reference/src/amcpy/feature_extraction.py:46-48``); this is a
transfer-path optimization specific to the device architecture.

Encoding is vectorized NumPy on the host (~GB/s, overlapped with device
work by the extraction pipeline); decoding is a handful of elementwise
XLA ops fused ahead of the extraction kernel.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "WIRE_FORMATS",
    "resolve_wire_format",
    "encode_planes",
    "decode_plane",
    "wire_bytes",
]

WIRE_FORMATS = ("f32", "int24", "int16")

#: int24 quantization: q = rint(x / s * 2^22) in [-2^22, 2^22] so the
#: arithmetic-shift high half fits int16 and one uint8 carries the rest
_INT24_SHIFT = 22
#: int16 quantization: q in [-32767, 32767]
_INT16_MAX = 32767


def resolve_wire_format(fmt: str) -> str:
    """``"auto"`` -> ``int24`` on TPU backends (parity-gated win on the
    tunneled wire), ``f32`` elsewhere (no wire to optimize)."""
    if fmt == "auto":
        from amcpy_tpu.extraction import backend_is_tpu

        return "int24" if backend_is_tpu() else "f32"
    if fmt not in WIRE_FORMATS:
        raise ValueError(
            f"unknown wire format {fmt!r} (use auto|{'|'.join(WIRE_FORMATS)})"
        )
    return fmt


def _frame_scale(i: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Shared per-frame scale over both planes (keeps I/Q relative scale
    exact); tiny floor avoids 0/0 on all-zero frames."""
    s = np.maximum(
        np.abs(i).max(axis=-1, keepdims=True),
        np.abs(q).max(axis=-1, keepdims=True),
    )
    return np.maximum(s, np.float32(1e-30)).astype(np.float32)


def encode_planes(
    i: np.ndarray, q: np.ndarray, fmt: str
) -> tuple[np.ndarray, ...]:
    """Encode ``(B, N)`` f32 I/Q planes for the wire.

    Returns the tuple of host arrays to upload, ending with the
    ``(B, 1)`` f32 per-frame scale:

    * ``int24`` -> ``(hi_i i16, lo_i u8, hi_q i16, lo_q u8, scale)``
    * ``int16`` -> ``(qi i16, qq i16, scale)``
    """
    if fmt == "f32":
        raise ValueError("f32 has no encoded form — upload planes directly")
    s = _frame_scale(i, q)
    if fmt == "int24":
        k = np.float32(1 << _INT24_SHIFT)
        qi = np.rint(i * (k / s)).astype(np.int32)
        qq = np.rint(q * (k / s)).astype(np.int32)
        return (
            (qi >> 8).astype(np.int16),
            (qi & 0xFF).astype(np.uint8),
            (qq >> 8).astype(np.int16),
            (qq & 0xFF).astype(np.uint8),
            s,
        )
    if fmt == "int16":
        k = np.float32(_INT16_MAX)
        return (
            np.rint(i * (k / s)).astype(np.int16),
            np.rint(q * (k / s)).astype(np.int16),
            s,
        )
    raise ValueError(f"unknown wire format {fmt!r}")


def decode_plane(*enc, fmt: str):
    """Dequantize one plane on device (jnp): ``int24`` takes
    ``(hi, lo, scale)``, ``int16`` takes ``(q, scale)``. Returns f32."""
    import jax.numpy as jnp

    if fmt == "int24":
        hi, lo, s = enc
        q = hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)
        return q.astype(jnp.float32) * (
            s * jnp.float32(1.0 / (1 << _INT24_SHIFT))
        )
    if fmt == "int16":
        q, s = enc
        return q.astype(jnp.float32) * (s * jnp.float32(1.0 / _INT16_MAX))
    raise ValueError(f"unknown wire format {fmt!r}")


def wire_bytes(batch: int, frame_size: int, fmt: str) -> int:
    """Bytes on the wire for a ``(batch, frame_size)`` planar-pair chunk."""
    per_sample = {"f32": 8, "int24": 6, "int16": 4}[fmt]
    return batch * frame_size * per_sample + (
        0 if fmt == "f32" else batch * 4
    )
