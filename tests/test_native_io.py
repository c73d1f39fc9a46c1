"""Native IO library tests: build, parity with NumPy, stream framing."""

import numpy as np
import pytest

from amcpy_tpu.data import native_io
from amcpy_tpu.ops.features import to_planar


@pytest.fixture(scope="module")
def native_available():
    if not native_io.available():
        pytest.skip("native amc_io library not buildable here")
    return True


def test_planarize_matches_numpy(native_available):
    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((7, 333)) + 1j * rng.standard_normal((7, 333))
    ).astype(np.complex64)
    np.testing.assert_array_equal(
        native_io.planarize(frames), to_planar(frames)
    )
    # 3-D leading dims
    frames3 = frames.reshape(7, 1, 333)
    assert native_io.planarize(frames3).shape == (7, 1, 2, 333)


def test_deplanarize_roundtrip(native_available):
    rng = np.random.default_rng(1)
    frames = (
        rng.standard_normal((5, 128)) + 1j * rng.standard_normal((5, 128))
    ).astype(np.complex64)
    np.testing.assert_array_equal(
        native_io.deplanarize(native_io.planarize(frames)), frames
    )


def test_read_stream_frames(native_available, tmp_path):
    rng = np.random.default_rng(2)
    warmup = np.zeros(2400, dtype=np.complex64)
    payload = (
        rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    ).astype(np.complex64)
    path = tmp_path / "capture.bin"
    np.concatenate([warmup, payload]).tofile(path)

    planar = native_io.read_stream_frames(path, frame_size=1024)
    assert planar.shape == (4, 2, 1024)
    np.testing.assert_array_equal(
        planar, to_planar(payload.reshape(4, 1024))
    )
    two = native_io.read_stream_frames(path, frame_size=1024, max_frames=2)
    assert two.shape == (2, 2, 1024)


def test_standardize_matches_numpy(native_available):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((100, 6)).astype(np.float32)
    mean = x.mean(0)
    std = x.std(0)
    np.testing.assert_allclose(
        native_io.standardize(x, mean, std), (x - mean) / std, rtol=1e-6
    )


def test_fallback_stream_reads_are_bounded(monkeypatch, tmp_path):
    """The NumPy fallback must read only the requested window of a capture
    larger than one chunk (offset/count-bounded ``np.fromfile``), and the
    chunked reads must tile the capture exactly like one full read."""
    import importlib

    monkeypatch.setenv("AMCPY_NO_NATIVE", "1")
    import amcpy_tpu.data.native_io as nio

    importlib.reload(nio)
    try:
        rng = np.random.default_rng(7)
        warmup = np.zeros(100, dtype=np.complex64)
        n_frames, frame_size = 64, 256
        payload = (
            rng.standard_normal(n_frames * frame_size)
            + 1j * rng.standard_normal(n_frames * frame_size)
        ).astype(np.complex64)
        path = tmp_path / "big_capture.bin"
        np.concatenate([warmup, payload]).tofile(path)

        # Bound check: np.fromfile must be called with a finite count.
        calls = []
        orig_fromfile = np.fromfile

        def spy(f, dtype=float, count=-1, offset=0, **kw):
            calls.append((offset, count))
            return orig_fromfile(f, dtype=dtype, count=count, offset=offset, **kw)

        monkeypatch.setattr(np, "fromfile", spy)

        chunk_frames = 16
        chunks = []
        for start in range(0, n_frames, chunk_frames):
            chunks.append(
                nio.read_stream_frames(
                    path, frame_size,
                    skip=100 + start * frame_size,
                    max_frames=chunk_frames,
                )
            )
        got = np.concatenate(chunks)
        np.testing.assert_array_equal(
            got, to_planar(payload.reshape(n_frames, frame_size))
        )
        assert calls, "fallback did not route through np.fromfile"
        for offset, count in calls:
            assert count == chunk_frames * frame_size, (
                "fallback read the whole remaining capture instead of the "
                f"requested window (count={count})"
            )
    finally:
        monkeypatch.delenv("AMCPY_NO_NATIVE")
        importlib.reload(nio)


def test_numpy_fallback(monkeypatch, tmp_path):
    """With AMCPY_NO_NATIVE the pure-NumPy path must serve everything."""
    import importlib

    monkeypatch.setenv("AMCPY_NO_NATIVE", "1")
    import amcpy_tpu.data.native_io as nio

    importlib.reload(nio)
    try:
        rng = np.random.default_rng(4)
        frames = (
            rng.standard_normal((3, 64)) + 1j * rng.standard_normal((3, 64))
        ).astype(np.complex64)
        assert not nio.available()
        np.testing.assert_array_equal(nio.planarize(frames), to_planar(frames))
        np.testing.assert_array_equal(
            nio.deplanarize(to_planar(frames)), frames
        )
    finally:
        monkeypatch.delenv("AMCPY_NO_NATIVE")
        importlib.reload(nio)
