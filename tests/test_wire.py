"""Wire-codec tests: round-trip precision, extraction parity within the
float32 tolerance budget, and routing/fallback rules."""

import numpy as np
import pytest

from amcpy_tpu.extraction import extract_batch
from amcpy_tpu.ops.wire import (
    WIRE_FORMATS,
    decode_plane,
    encode_planes,
    resolve_wire_format,
    wire_bytes,
)


def _planes(b=32, n=512, seed=0):
    rng = np.random.default_rng(seed)
    # wide dynamic range across frames (like SNR sweeps): scales 1e-3..1e3
    scale = 10.0 ** rng.uniform(-3, 3, (b, 1)).astype(np.float32)
    i = (rng.standard_normal((b, n)) * scale).astype(np.float32)
    q = (rng.standard_normal((b, n)) * scale).astype(np.float32)
    return i, q


@pytest.mark.parametrize("fmt,bound_bits", [("int24", 22), ("int16", 15)])
def test_roundtrip_error_bound(fmt, bound_bits):
    i, q, = _planes()
    enc = encode_planes(i, q, fmt)
    half = (len(enc) - 1) // 2
    i2 = np.asarray(decode_plane(*enc[:half], enc[-1], fmt=fmt))
    q2 = np.asarray(decode_plane(*enc[half:-1], enc[-1], fmt=fmt))
    s = np.maximum(np.abs(i).max(-1, keepdims=True),
                   np.abs(q).max(-1, keepdims=True))
    # error model: quantizer half-step (0.5 * 2^-bits) + one f32 rounding
    # each on the host multiply and the device dequant multiply — worst
    # case ~3 half-steps of the quantizer, bounded here at 3.2
    bound = s * (0.5 ** bound_bits) * 1.6 + 1e-30
    assert np.all(np.abs(i2 - i) <= bound)
    assert np.all(np.abs(q2 - q) <= bound)


def test_wire_bytes_accounting():
    assert wire_bytes(100, 2048, "f32") == 100 * 2048 * 8
    assert wire_bytes(100, 2048, "int24") == 100 * 2048 * 6 + 400
    assert wire_bytes(100, 2048, "int16") == 100 * 2048 * 4 + 400


def test_resolve_wire_format():
    # CPU backend (the test suite's): auto -> f32 (no wire to optimize)
    assert resolve_wire_format("auto") == "f32"
    for fmt in WIRE_FORMATS:
        assert resolve_wire_format(fmt) == fmt
    with pytest.raises(ValueError):
        resolve_wire_format("bf16")


def test_extraction_int24_within_tolerance_budget():
    """Features extracted through the int24 wire must stay a small
    fraction of the float32-vs-float64 parity tolerance away from the
    f32-wire features — so enabling the codec cannot consume the parity
    budget (the full-scale gate re-asserts this against the reference on
    hardware: scripts/wire_gate.py)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from oracle import term_scales

    rng = np.random.default_rng(3)
    b, n = 48, 256
    scale = 10.0 ** rng.uniform(-2, 2, (b, 1))
    frames = (
        (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n)))
        * scale
    ).astype(np.complex64)
    # kernel="fused" on CPU runs the interpret-mode Pallas path, which
    # carries the wire decode in the same program as on TPU
    ours_f32 = extract_batch(frames, kernel="fused", wire="f32")
    tim: dict = {}
    ours_i24 = extract_batch(frames, kernel="fused", wire="int24",
                             timings=tim)
    assert tim["wire"] == "int24"
    tol = np.stack([
        1e-4 * term_scales(f) + 1e-5 * np.abs(ours_f32[k])
        for k, f in enumerate(frames)
    ])
    frac = np.abs(ours_i24.astype(np.float64) - ours_f32) / tol
    assert frac.max() < 0.25, f"int24 wire ate {frac.max():.2%} of budget"


def test_extraction_wire_falls_back_off_fused_route():
    """The codec only applies on the fused route: XLA kernel and
    seq-sharded meshes upload raw f32 regardless of the requested
    format."""
    rng = np.random.default_rng(4)
    frames = (
        rng.standard_normal((16, 256)) + 1j * rng.standard_normal((16, 256))
    ).astype(np.complex64)
    tim: dict = {}
    a = extract_batch(frames, kernel="xla", wire="int24", timings=tim)
    assert tim["wire"] == "f32"
    b = extract_batch(frames, kernel="xla", wire="f32")
    np.testing.assert_array_equal(a, b)
