"""Integration tests: synthetic dataset -> sharded extraction -> artifacts.

Runs on the 8-virtual-device CPU mesh (conftest), exercising the same
sharding path the TPU uses.
"""

import numpy as np
import pytest

import jax

from amcpy_tpu.config import Config
from amcpy_tpu.data import io_mat, synth
from amcpy_tpu.extraction import extract_batch, run_extraction
from amcpy_tpu.parallel.mesh import make_mesh

from .oracle import features_batch, term_scales


@pytest.fixture()
def tiny_cfg(tmp_path):
    return Config().replace(
        paths={"root": str(tmp_path)},
        signals={"frame_size": 128, "num_frames": 6},
    )


def test_generate_dataset_shapes(tiny_cfg):
    data = synth.generate_dataset(tiny_cfg, seed=3)
    assert set(data) == {
        "signal_bpsk",
        "signal_qpsk",
        "signal_8psk",
        "signal_qam16",
        "signal_qam64",
        "signal_noise",
    }
    for arr in data.values():
        assert arr.shape == (16, 6, 128)
        assert arr.dtype == np.complex64


def test_snr_calibration(tiny_cfg):
    """Generated frames should hit the configured SNR: total power at SNR s
    is 1 + 10^(-s/10)."""
    cfg = tiny_cfg.replace(signals={"frame_size": 2048, "num_frames": 8})
    arr = synth.generate_modulation("QPSK", cfg, seed=0)
    power = np.mean(np.abs(arr) ** 2, axis=(1, 2))
    want = 1.0 + 10 ** (-np.asarray(cfg.signals.snr_db) / 10)
    np.testing.assert_allclose(power, want, rtol=0.1)
    wgn = synth.generate_modulation("WGN", cfg, seed=0)
    np.testing.assert_allclose(np.mean(np.abs(wgn) ** 2), 1.0, rtol=0.05)


def test_extract_batch_sharded_matches_oracle(tiny_cfg):
    mesh = make_mesh(tiny_cfg)
    assert mesh.shape["data"] == 8
    rng = np.random.default_rng(0)
    # 13 frames: deliberately NOT a multiple of 8 to exercise padding
    frames = (
        rng.standard_normal((13, 256)) + 1j * rng.standard_normal((13, 256))
    ).astype(np.complex64)
    got = extract_batch(frames, mesh=mesh)
    want = features_batch(frames)
    for bi in range(13):
        tol = 1e-4 * term_scales(frames[bi]) + 1e-5 * np.abs(want[bi])
        assert (np.abs(got[bi] - want[bi]) <= tol).all()


def test_extract_batch_chunked_pipeline_parity(tiny_cfg):
    # the software-pipelined multi-chunk path must match one big chunk,
    # including a final partial chunk (100 % 17 != 0)
    mesh = make_mesh(tiny_cfg)
    rng = np.random.default_rng(7)
    frames = (
        rng.standard_normal((100, 256)) + 1j * rng.standard_normal((100, 256))
    ).astype(np.complex64)
    chunked = extract_batch(frames, mesh=mesh, chunk_size=17)
    whole = extract_batch(frames, mesh=mesh, chunk_size=1000)
    # different chunk shapes compile to different programs -> ~1 ulp drift
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-7)


def test_extract_batch_pallas_kernel_routing(tiny_cfg):
    """kernel="pallas" must be reachable from the product path and match
    the XLA kernel (interpret mode on CPU; compiled Mosaic on TPU)."""
    mesh = make_mesh(tiny_cfg)
    rng = np.random.default_rng(3)
    frames = (
        rng.standard_normal((24, 256)) + 1j * rng.standard_normal((24, 256))
    ).astype(np.complex64)
    got = extract_batch(frames, mesh=mesh, kernel="pallas")
    want = extract_batch(frames, mesh=mesh, kernel="xla")
    # atol covers float32 cancellation noise on the cumulants (the two
    # kernels associate the moment arithmetic differently)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_extract_batch_seq_mesh_routing(tiny_cfg):
    """A configured seq axis > 1 must route through the sequence-parallel
    kernel (devices on the seq axis do real work) and match data-only."""
    cfg = tiny_cfg.replace(compute={"mesh_shape": (4, 2)})
    mesh = make_mesh(cfg)
    assert mesh.shape["seq"] == 2
    rng = np.random.default_rng(5)
    frames = (
        rng.standard_normal((16, 256)) + 1j * rng.standard_normal((16, 256))
    ).astype(np.complex64)
    got = extract_batch(frames, mesh=mesh, gmax_mode="fft")
    want = extract_batch(frames, mesh=make_mesh(tiny_cfg), gmax_mode="fft")
    # atol covers float32 reduction-order noise (shard-local partial sums
    # + psum vs one flat reduction) on the cancellation-heavy cumulants
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_run_extraction_uses_configured_kernel(tiny_cfg, monkeypatch):
    """cfg.compute.kernel must actually reach the extractor."""
    import amcpy_tpu.extraction as ex

    seen = []
    real = ex._kernel_fn

    def spy(mesh, kernel, normalize_scale, gmax_mode, wire="f32"):
        seen.append(kernel)
        return real(mesh, kernel, normalize_scale, gmax_mode, wire=wire)

    monkeypatch.setattr(ex, "_kernel_fn", spy)
    cfg = tiny_cfg.replace(compute={"kernel": "pallas"})
    synth.write_dataset(cfg, seed=1)
    run_extraction(cfg)
    assert seen and all(k == "pallas" for k in seen)


def test_run_extraction_end_to_end(tiny_cfg):
    synth.write_dataset(tiny_cfg, seed=1)
    results = run_extraction(tiny_cfg)
    assert set(results) == set(tiny_cfg.signals.modulations_with_noise)
    for mod, feats in results.items():
        assert feats.shape == (16, 6, 18)
        assert np.isfinite(feats).all()
        # artifact round-trip
        loaded = io_mat.load_features(tiny_cfg, mod)
        np.testing.assert_array_equal(loaded, feats)

    # parity on one (mod, snr) slice vs oracle
    raw = io_mat.load_modulation(tiny_cfg, "QPSK")
    want = features_batch(raw[10])
    got = results["QPSK"][10]
    for bi in range(want.shape[0]):
        tol = 1e-4 * term_scales(raw[10][bi]) + 1e-5 * np.abs(want[bi])
        assert (np.abs(got[bi] - want[bi]) <= tol).all()


def test_run_extraction_idempotent(tiny_cfg):
    synth.write_dataset(tiny_cfg, seed=1)
    first = run_extraction(tiny_cfg)
    # second run must skip recomputation and return identical artifacts
    second = run_extraction(tiny_cfg)
    for mod in first:
        np.testing.assert_array_equal(first[mod], second[mod])


def test_stacked_batch_layout(tiny_cfg):
    data = synth.generate_dataset(tiny_cfg, seed=2)
    flat = io_mat.stacked_batch(data, tiny_cfg)
    m, s, f, n = 6, 16, 6, 128
    assert flat.shape == (m * s * f, n)
    # (mod, snr, frame) ordering: row of mod i, snr j, frame k
    i, j, k = 3, 7, 2
    row = flat[i * s * f + j * f + k]
    mod = tiny_cfg.signals.modulations_with_noise[i]
    np.testing.assert_array_equal(
        row, data[tiny_cfg.signals.mat_info[mod]][j, k]
    )


def test_run_extraction_recovers_corrupt_artifact(tiny_cfg):
    synth.write_dataset(tiny_cfg, seed=1)
    first = run_extraction(tiny_cfg)
    # corrupt one artifact; a re-run must detect and recompute it
    bad = tiny_cfg.paths.calculated_features / "QPSK_features.mat"
    bad.write_bytes(b"not a mat file")
    second = run_extraction(tiny_cfg)
    np.testing.assert_array_equal(second["QPSK"], first["QPSK"])


def test_run_extraction_synthetic_non_divisible_batch(tmp_path):
    """Per-mod batches that don't divide the device count (here 5 SNRs x
    4 frames = 20 on 8 devices) must pad, not raise (ADVICE r2 item 1)."""
    from amcpy_tpu.extraction import run_extraction_synthetic

    cfg = Config().replace(
        paths={"root": str(tmp_path)},
        signals={
            "frame_size": 128,
            "num_frames": 4,
            "snr_db": (0, 4, 8, 12, 16),
        },
    )
    dev = run_extraction_synthetic(cfg, seed=2)
    for mod, feats in dev.items():
        assert feats.shape == (5, 4, 18)
        assert np.isfinite(feats).all(), mod


def test_run_extraction_synthetic_matches_host_path(tiny_cfg):
    """On-device generate->extract == host generate + extract (same seed)."""
    from amcpy_tpu.extraction import run_extraction_synthetic

    synth.write_dataset(tiny_cfg, seed=9)
    host = run_extraction(tiny_cfg, force=True)
    dev = run_extraction_synthetic(tiny_cfg, seed=9)
    for mod in host:
        assert dev[mod].shape == host[mod].shape
        np.testing.assert_allclose(
            dev[mod], host[mod], rtol=2e-3, atol=1e-5
        )


def test_extract_batch_timings_breakdown():
    """extract_batch(timings=...) must report the host-path phase split
    (host_prep / h2d / wait / bytes) used by bench end_to_end and
    `amc parity` (VERDICT r3 items 1/7)."""
    import numpy as np

    from amcpy_tpu.extraction import extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((32, 128)) + 1j * rng.standard_normal((32, 128))
    ).astype(np.complex64)
    tim: dict = {}
    out = extract_batch(frames, mesh=make_mesh(), timings=tim)
    assert out.shape == (32, 18)
    for key in ("host_prep_s", "h2d_s", "wait_s", "bytes_h2d"):
        assert key in tim and tim[key] >= 0
    # planar f32 (with data-axis padding) crossed the wire
    assert tim["bytes_h2d"] >= 32 * 2 * 128 * 4


def test_prepare_frames_matches_direct_path(tiny_cfg):
    """extract_batch(PreparedBatch) — the loader-thread prefetch contract
    — must equal extract_batch(frames) bit-for-bit for both the packed
    (xla) and plane (fused/interpret) routes, including the wire codec."""
    from amcpy_tpu.extraction import prepare_frames

    mesh = make_mesh(tiny_cfg)
    rng = np.random.default_rng(11)
    frames = (
        rng.standard_normal((52, 256)) + 1j * rng.standard_normal((52, 256))
    ).astype(np.complex64)

    for kernel, wire in (("xla", "f32"), ("fused", "f32"),
                         ("fused", "int24")):
        direct = extract_batch(
            frames, mesh=mesh, kernel=kernel, wire=wire
        )
        prepared = prepare_frames(
            frames, mesh=mesh, kernel=kernel, wire=wire
        )
        tim: dict = {}
        via_prep = extract_batch(
            prepared, mesh=mesh, kernel=kernel, timings=tim
        )
        np.testing.assert_array_equal(direct, via_prep)
        assert tim["wire"] == (wire if kernel == "fused" else "f32")
        assert tim["host_prep_s"] <= tim["prep_total_s"] + 1e-9
