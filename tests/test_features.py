"""Conformance tests for the fused feature extractor.

1. Golden-vector test: the reference repo's embedded unit tests pin exact
   values for all 18 features on a deterministic 10-sample signal
   (``/root/reference/src/amcpy/features.py:283-311``). Those values are the
   primary parity artifact and are reproduced here verbatim (rtol=1e-5).
2. Fuzz parity vs the independent float64 NumPy oracle over random
   QAM/PSK/WGN-like frames at realistic frame sizes.
"""

import numpy as np
import pytest

from amcpy_tpu.ops.features import NUM_FEATURES, extract_features

from .oracle import features_batch, features_frame, term_scales


def _golden_signal() -> np.ndarray:
    re = np.array([0, -1, 2, -3, 4, -5, 6, -7, 8, -9], dtype=np.float64)
    im = -re
    im[0] = 0.0
    return (re + 1j * im).astype(np.complex128)


# Golden values from the reference's own unit tests (features.py:286-305).
GOLDEN = np.array(
    [
        405.0,
        0.940293603578649,
        1.5903100728408748,
        0.3312693299999689,
        0.5153882032022075,
        6.363961030678928,
        0.7977443845417482,
        1.7757575757575754,
        1.0627162629757787,
        57.0,
        57.0,
        3613.8,
        3613.8,
        3613.8,
        3905583.0,
        1094628.0,
        311904.0,
        1094628.0,
    ]
)


def test_oracle_matches_golden():
    got = features_frame(_golden_signal())
    np.testing.assert_allclose(got, GOLDEN, rtol=1e-10)


@pytest.mark.parametrize("normalize", [True, False])
def test_extractor_matches_golden(normalize):
    sig = _golden_signal().astype(np.complex64)[None, :]
    got = np.asarray(extract_features(sig, normalize_scale=normalize))[0]
    np.testing.assert_allclose(got, GOLDEN, rtol=2e-5)


def _random_frames(kind: str, b: int, n: int, snr_db: float, rng) -> np.ndarray:
    """Synthesize modulated frames + AWGN (oracle-side generator)."""
    if kind == "wgn":
        sym = np.zeros((b, n), np.complex128)
    elif kind == "bpsk":
        sym = rng.choice([-1.0, 1.0], size=(b, n)).astype(np.complex128)
    elif kind == "qpsk":
        c = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
        sym = c[rng.integers(0, 4, size=(b, n))]
    elif kind == "qam16":
        lv = np.array([-3.0, -1.0, 1.0, 3.0]) / np.sqrt(10)
        sym = lv[rng.integers(0, 4, (b, n))] + 1j * lv[rng.integers(0, 4, (b, n))]
    else:
        raise ValueError(kind)
    npow = 10 ** (-snr_db / 10)
    noise = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))) * np.sqrt(
        npow / 2
    )
    if kind == "wgn":
        noise = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))) / np.sqrt(2)
        return noise
    return sym + noise


@pytest.mark.parametrize("kind", ["bpsk", "qpsk", "qam16", "wgn"])
@pytest.mark.parametrize("snr_db", [-10.0, 0.0, 20.0])
def test_fuzz_parity_vs_oracle(kind, snr_db):
    rng = np.random.default_rng(hash((kind, snr_db)) % 2**32)
    frames = _random_frames(kind, 4, 2048, snr_db, rng)
    want = features_batch(frames)
    got = np.asarray(extract_features(frames.astype(np.complex64)))
    assert got.shape == (4, NUM_FEATURES)

    for bi in range(frames.shape[0]):
        scales = term_scales(frames[bi])
        err = np.abs(got[bi] - want[bi])
        # float32 pipeline vs float64 oracle: error budget is relative to
        # the magnitude of the terms entering each feature (cumulants are
        # cancellations of moment products).
        tol = 1e-4 * scales + 1e-5 * np.abs(want[bi])
        bad = err > tol
        assert not bad.any(), (
            f"{kind}@{snr_db}dB frame {bi}: features {np.nonzero(bad)[0] + 1} "
            f"err={err[bad]} tol={tol[bad]} got={got[bi][bad]} want={want[bi][bad]}"
        )


def test_large_amplitude_scaling():
    """Scale normalization keeps huge-amplitude frames accurate in float32."""
    rng = np.random.default_rng(0)
    frames = _random_frames("qam16", 2, 1024, 10.0, rng) * 1e4
    want = features_batch(frames)
    got = np.asarray(extract_features(frames.astype(np.complex64)))
    for bi in range(2):
        scales = term_scales(frames[bi])
        err = np.abs(got[bi] - want[bi])
        assert (err <= 1e-4 * scales + 1e-5 * np.abs(want[bi])).all()


def test_batch_shapes_and_dtype():
    rng = np.random.default_rng(1)
    frames = _random_frames("qpsk", 3, 256, 5.0, rng).astype(np.complex64)
    out = extract_features(frames)
    assert out.shape == (3, 18)
    assert out.dtype == np.float32
    # leading batch dims preserved
    out2 = extract_features(frames.reshape(1, 3, 256))
    np.testing.assert_allclose(np.asarray(out2)[0], np.asarray(out), rtol=1e-6)


def test_gmax_matmul_matches_fft():
    """Four-step MXU DFT == XLA FFT == float64 oracle for gamma_max."""
    from amcpy_tpu.ops.fft import best_factorization, gmax_fft, gmax_matmul

    assert best_factorization(2048) == (8, 256)
    assert best_factorization(1024) == (8, 128)
    n1, n2 = best_factorization(65536)
    assert n1 * n2 == 65536 and n2 <= 512
    assert best_factorization(17) is None

    rng = np.random.default_rng(7)
    for n in (256, 1024, 2048):
        frames = (
            rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
        ).astype(np.complex64)
        i = frames.real.copy()
        q = frames.imag.copy()
        a = np.asarray(gmax_fft(i, q))
        b = np.asarray(gmax_matmul(i, q))
        want = np.max(np.abs(np.fft.fft(frames.astype(np.complex128))) ** 2, -1) / n
        np.testing.assert_allclose(a, want, rtol=2e-4)
        np.testing.assert_allclose(b, want, rtol=2e-4)


def test_extractor_gmax_modes_agree():
    rng = np.random.default_rng(8)
    frames = (
        rng.standard_normal((4, 512)) + 1j * rng.standard_normal((4, 512))
    ).astype(np.complex64)
    a = np.asarray(extract_features(frames))
    from amcpy_tpu.ops.features import extract_features_planar, to_planar

    b = np.asarray(extract_features_planar(to_planar(frames), gmax_mode="matmul"))
    np.testing.assert_allclose(b[:, 0], a[:, 0], rtol=2e-4)
    np.testing.assert_array_equal(b[:, 1:], a[:, 1:])


def test_scan_chunked_extractor_matches_flat():
    """The one-dispatch lax.scan large-batch path (16k-spill fix) must
    match the flat extractor, including the padded final chunk."""
    from amcpy_tpu.ops.features import (
        extract_features_planar,
        extract_features_planar_scan,
        to_planar,
    )

    rng = np.random.default_rng(11)
    frames = (
        rng.standard_normal((50, 256)) + 1j * rng.standard_normal((50, 256))
    ).astype(np.complex64)
    iq = to_planar(frames)
    flat = np.asarray(extract_features_planar(iq, gmax_mode="fft"))
    scanned = np.asarray(
        extract_features_planar_scan(iq, chunk=16, gmax_mode="fft")
    )
    np.testing.assert_allclose(scanned, flat, rtol=1e-6, atol=1e-7)


def test_best_factorization_multiple_of():
    """The SP distributed DFT needs n1 % n_seq == 0; the search must find
    a divisible factorization whenever one exists (VERDICT r3 item 9 —
    round 3 only checked the DEFAULT factorization and silently fell back
    to a full-frame all_gather otherwise)."""
    from amcpy_tpu.ops.fft import best_factorization

    # default pick unchanged
    assert best_factorization(2048) == (8, 256)
    # seq=16 at N=2048: default n1=8 fails 8%16; divisible pick exists
    assert best_factorization(2048, multiple_of=16) == (16, 128)
    assert best_factorization(2048, multiple_of=32) == (32, 64)
    # n1 may exceed sqrt(n) when the divisibility demands it
    assert best_factorization(2048, multiple_of=64) == (64, 32)
    # 900 = 2^2*3^2*5^2: default first factor is 9 (not div by 4),
    # but (12, 75) exists for seq=4
    assert best_factorization(900) == (9, 100)
    assert best_factorization(900, multiple_of=4) == (12, 75)
    # no factor divisible by 8 -> None (SP falls back to all_gather)
    assert best_factorization(900, multiple_of=8) is None
    assert best_factorization(17, multiple_of=2) is None
    # the constrained search must look ABOVE sqrt(n): 242 = 2*11^2 has
    # its only even factorization at (22, 11) (code-review r4 finding)
    assert best_factorization(242, multiple_of=2) == (22, 11)
    assert best_factorization(484, multiple_of=4) == (44, 11)
