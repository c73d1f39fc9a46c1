"""Serving pipeline tests: end-to-end raw IQ -> label, stream classification,
and bitwise determinism of the full chain."""

import numpy as np
import pytest

from amcpy_tpu.config import Config
from amcpy_tpu.data import io_mat, synth
from amcpy_tpu.extraction import run_extraction
from amcpy_tpu.preprocessing import preprocess
from amcpy_tpu.serve import AMCPipeline
from amcpy_tpu.train import save_checkpoint, train


@pytest.fixture(scope="module")
def trained_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_proj")
    cfg = Config().replace(
        paths={"root": str(root)},
        signals={"frame_size": 256, "num_frames": 30},
        training={"epochs": 10, "batch_size": 64},
    )
    synth.write_dataset(cfg, seed=5)
    features = run_extraction(cfg)
    x_train, x_test, y_train, y_test, scaler = preprocess(features, cfg)
    model, state, history, model_id = train(
        cfg, x_train, y_train, x_test, y_test
    )
    save_checkpoint(cfg, model_id, state, scaler, history, cfg.training.epochs)
    return cfg, model_id


def test_pipeline_predicts_high_snr(trained_project):
    cfg, model_id = trained_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    raw = io_mat.load_modulation(cfg, "BPSK")  # (16, 30, 256)
    high_snr = raw[-3:].reshape(-1, 256)  # 16..20 dB
    preds = pipe.predict(high_snr)
    assert preds.shape == (90,)
    # BPSK at high SNR should be mostly recognized
    assert (preds == 0).mean() > 0.5
    names = pipe.predict_names(high_snr[:5])
    assert all(n in cfg.signals.modulations_with_noise for n in names)
    probs = pipe.predict_proba(high_snr[:5])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_pipeline_planar_and_complex_agree(trained_project):
    cfg, model_id = trained_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    raw = io_mat.load_modulation(cfg, "QPSK")[10, :8]
    from amcpy_tpu.ops.features import to_planar

    np.testing.assert_array_equal(
        pipe.predict(raw), pipe.predict(to_planar(raw))
    )


def test_pipeline_deterministic(trained_project):
    """Same input -> bitwise identical logits (functional purity; the
    race-detection analogue for this framework, SURVEY.md sec 5)."""
    cfg, model_id = trained_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    raw = io_mat.load_modulation(cfg, "16QAM")[8, :16]
    a = np.asarray(pipe.logits(raw))
    b = np.asarray(pipe.logits(raw))
    np.testing.assert_array_equal(a, b)


def test_classify_stream(trained_project, tmp_path):
    cfg, model_id = trained_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    raw = io_mat.load_modulation(cfg, "BPSK")[-1]  # (30, 256) best SNR
    stream = np.concatenate(
        [np.zeros(2400, np.complex64), raw.reshape(-1)]
    )
    path = tmp_path / "capture.bin"
    stream.tofile(path)
    preds = pipe.classify_stream(path, frame_size=256)
    assert preds.shape == (30,)
    assert (preds == 0).mean() > 0.5


def test_extraction_deterministic(trained_project):
    cfg, _ = trained_project
    from amcpy_tpu.extraction import extract_batch

    raw = io_mat.load_modulation(cfg, "8PSK")[5, :10]
    a = extract_batch(raw)
    b = extract_batch(raw)
    np.testing.assert_array_equal(a, b)


def test_pipeline_bucketed_compile_count(trained_project):
    """Arbitrary request batch sizes must hit power-of-two buckets: N
    distinct sizes -> at most log2 compiled programs, and padded results
    must equal unbucketed ones row-for-row (VERDICT r3 item 8)."""
    from amcpy_tpu import serve

    cfg, model_id = trained_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    pipe.multi_device = False  # bucket accounting is per-device; the
    # multi-device fan-out has its own parity test below
    rng = np.random.default_rng(3)
    frames = (
        rng.standard_normal((500, 2, cfg.signals.frame_size)).astype(
            np.float32
        )
    )
    serve._pipeline_logits._clear_cache()
    sizes = (1, 3, 7, 20, 33, 64, 100, 129, 200, 500)
    outs = {b: np.asarray(pipe.logits(frames[:b])) for b in sizes}
    # 10 distinct sizes -> buckets {64, 128, 256, 512} only
    assert serve._pipeline_logits._cache_size() <= 4
    for b in sizes:
        assert outs[b].shape == (b, 6)
    # bucketing must not change values: same rows, different pad amounts
    np.testing.assert_allclose(outs[500][:100], outs[100], atol=1e-5)
    np.testing.assert_allclose(outs[33][:3], outs[3], atol=1e-5)


def test_http_server_classify_and_health(trained_project):
    """`amc serve`'s HTTP surface: raw complex64 bytes in, labels out;
    planar format; probs; health counters; malformed-body errors."""
    import json
    import threading
    import urllib.request

    from amcpy_tpu.server import AMCServer

    cfg, model_id = trained_project
    srv = AMCServer(cfg, model_id, host="127.0.0.1", port=0)
    host, port = srv.address
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        # health
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["frame_size"] == 256
        assert h["classes"][0] == "BPSK"

        raw = io_mat.load_modulation(cfg, "BPSK")  # (16, 30, 256) c64
        frames = np.ascontiguousarray(raw[-2:].reshape(-1, 256))

        def post(path, body):
            req = urllib.request.Request(
                f"{base}{path}", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        # complex64 wire format (GNU Radio layout)
        out = post("/classify", frames.tobytes())
        assert len(out["labels"]) == 60
        assert (
            np.asarray(out["class_ids"]) == 0
        ).mean() > 0.5  # mostly BPSK at high SNR

        # planar format + probabilities
        planar = np.stack([frames.real, frames.imag], axis=1).astype(
            np.float32
        )
        out2 = post("/classify?format=planar&probs=1", planar.tobytes())
        assert out2["class_ids"] == out["class_ids"]
        probs = np.asarray(out2["probs"])
        assert probs.shape == (60, 6)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

        # malformed body -> 400 with an explanation
        import urllib.error

        try:
            post("/classify", b"\x00" * 13)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "whole number" in json.loads(e.read())["error"]

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h2 = json.loads(r.read())
        assert h2["requests"] == 2 and h2["frames_classified"] == 120
    finally:
        srv.shutdown()


def test_http_server_concurrent_requests(trained_project):
    """Concurrent POSTs: the threaded HTTP front serializes device access
    behind the inference lock — every request succeeds and the counters
    account for every frame exactly once."""
    import concurrent.futures as cf
    import json
    import threading
    import urllib.request

    from amcpy_tpu.server import AMCServer

    cfg, model_id = trained_project
    srv = AMCServer(cfg, model_id, host="127.0.0.1", port=0)
    host, port = srv.address
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://{host}:{port}"
    try:
        raw = io_mat.load_modulation(cfg, "QPSK")[-1, :16]  # (16, 256) c64
        body = np.ascontiguousarray(raw).tobytes()

        def post(_):
            req = urllib.request.Request(
                f"{base}/classify", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        with cf.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(post, range(8)))
        assert all(len(o["labels"]) == 16 for o in outs)
        # identical inputs -> identical outputs regardless of interleaving
        assert all(o["class_ids"] == outs[0]["class_ids"] for o in outs)
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["requests"] == 8 and h["frames_classified"] == 128
    finally:
        srv.shutdown()


def test_http_server_rejects_bad_frame_size(trained_project):
    """frame_size=0 is a client error (400), not a 500 (code-review r4)."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from amcpy_tpu.server import AMCServer

    cfg, model_id = trained_project
    srv = AMCServer(cfg, model_id, host="127.0.0.1", port=0)
    host, port = srv.address
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/classify?frame_size=0",
            data=b"\x00" * 64,
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "frame_size" in json.loads(e.read())["error"]
    finally:
        srv.shutdown()


def test_pipeline_multi_device_batch_parity(trained_project):
    """Large request batches fan out round-robin over every local device
    (8 on the test mesh); predictions must equal the single-device path
    row-for-row, in order."""
    import jax

    cfg, model_id = trained_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    raw = io_mat.load_modulation(cfg, "8PSK")  # (16, 30, 256)
    frames = np.ascontiguousarray(
        np.tile(raw.reshape(-1, 256), (2, 1))
    )  # 960 frames >= 8 devices x MIN_BUCKET (the fan-out break-even)

    pipe.multi_device = False
    single = np.asarray(pipe.logits(frames))
    pipe.multi_device = True
    multi = np.asarray(pipe.logits(frames))
    assert multi.shape == single.shape == (960, 6)
    np.testing.assert_allclose(multi, single, atol=1e-5)
    # the fan-out actually used more than one device (consts cached per
    # device it dispatched to)
    assert len(pipe._dev_consts) == len(jax.local_devices()) > 1
    # small batches stay on the single-device fast path
    small = np.asarray(pipe.logits(frames[:8]))
    np.testing.assert_allclose(small, single[:8], atol=1e-5)


def test_batcher_coalesces_concurrent_requests():
    """The serving batcher must merge a backlog of requests into ONE
    device dispatch (continuous batching, VERDICT r4 weak #3) and hand
    each caller exactly its own rows, while a lone request dispatches
    without waiting for the coalescing window."""
    import threading

    from amcpy_tpu.server import _Batcher

    calls = []
    release = threading.Event()

    class SlowPipe:
        def logits(self, frames):
            calls.append(frames.shape[0])
            if len(calls) == 1:
                release.wait(timeout=30)  # hold the first dispatch open
            # identity-ish logits encoding the frame's first sample so
            # every caller can verify it got its own rows back
            return np.repeat(frames[:, 0, :1], 6, axis=1)

    b = _Batcher(SlowPipe(), window_s=0.05)
    try:
        frames = [
            np.full((k + 1, 2, 8), float(k), np.float32) for k in range(5)
        ]
        outs: list = [None] * 5
        threads = []
        gate = threading.Barrier(5)

        def go(k):
            if k == 0:
                gate.wait()  # everyone starts together
                outs[0] = b.infer(frames[0])
            else:
                gate.wait()
                time.sleep(0.05)  # queue up behind the held dispatch
                outs[k] = b.infer(frames[k])

        import time

        for k in range(5):
            t = threading.Thread(target=go, args=(k,))
            t.start()
            threads.append(t)
        time.sleep(0.5)  # requests 1..4 are now queued
        release.set()
        for t in threads:
            t.join(timeout=30)
        for k in range(5):
            assert outs[k].shape == (k + 1, 6)
            np.testing.assert_array_equal(outs[k], float(k))
        # first dispatch ran alone; the 4 queued requests coalesced into
        # far fewer dispatches (one, unless scheduling jitter splits them)
        assert calls[0] == 1
        assert len(calls) <= 3
        assert sum(calls) == sum(k + 1 for k in range(5))
        assert b.coalesced_requests == 5
        assert b.max_coalesced >= 2
    finally:
        b.stop()


def test_http_server_rejects_mismatched_frame_size(trained_project):
    """frame_size != the model's training frame size returns 400 unless
    allow_any_frame_size=1 is passed (ADVICE r4: the feature statistics
    shift with N, so silent acceptance yields unreliable labels)."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from amcpy_tpu.server import AMCServer

    cfg, model_id = trained_project
    srv = AMCServer(cfg, model_id, host="127.0.0.1", port=0)
    host, port = srv.address
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    body = np.zeros(128, np.complex64)
    body = (body + 1.0).astype(np.complex64).tobytes()  # 1 frame of 128
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/classify?frame_size=128",
            data=body,
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "allow_any_frame_size" in json.loads(e.read())["error"]
        # explicit override goes through
        req = urllib.request.Request(
            f"http://{host}:{port}/classify?frame_size=128"
            "&allow_any_frame_size=1",
            data=body,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["labels"]) == 1
    finally:
        srv.shutdown()


def test_batcher_groups_mixed_frame_shapes():
    """Requests with different frame sizes coalesced into one batch must
    dispatch as separate shape groups — a ragged concatenate would fail
    every co-batched request (review r5)."""
    import threading
    import time

    from amcpy_tpu.server import _Batcher

    release = threading.Event()
    calls = []

    class SlowPipe:
        def logits(self, frames):
            calls.append(frames.shape)
            if len(calls) == 1:
                release.wait(timeout=30)
            return np.repeat(frames[:, 0, :1], 6, axis=1)

    b = _Batcher(SlowPipe(), window_s=0.05)
    try:
        outs = {}

        def go(name, n_frames, width):
            outs[name] = b.infer(
                np.full((n_frames, 2, width), 1.0, np.float32)
            )

        t0 = threading.Thread(target=go, args=("hold", 1, 16))
        t0.start()
        time.sleep(0.3)  # first dispatch held open
        ts = [
            threading.Thread(target=go, args=("a", 2, 16)),
            threading.Thread(target=go, args=("b", 3, 32)),  # other shape
        ]
        for t in ts:
            t.start()
        time.sleep(0.3)  # both queued behind the held dispatch
        release.set()
        t0.join(timeout=30)
        for t in ts:
            t.join(timeout=30)
        assert outs["a"].shape == (2, 6)
        assert outs["b"].shape == (3, 6)
        # the mixed backlog dispatched as two shape groups
        assert (2, 2, 16) in calls and (3, 2, 32) in calls
    finally:
        b.stop()


def test_batcher_stop_fails_late_items():
    """Items enqueued around shutdown must error out, not hang their
    handler threads forever (review r5)."""
    from amcpy_tpu.server import _Batcher, _WorkItem

    class Pipe:
        def logits(self, frames):
            return np.zeros((frames.shape[0], 6), np.float32)

    b = _Batcher(Pipe(), window_s=0.0)
    late = _WorkItem(np.zeros((1, 2, 8), np.float32))
    b.q.put(late)  # enqueue directly, bypassing infer's stopped check
    b.stop()
    assert late.done.wait(timeout=10)
    assert late.error is not None or late.logits is not None
    import pytest

    with pytest.raises(RuntimeError):
        b.infer(np.zeros((1, 2, 8), np.float32))


def test_http_server_backpressure_503(trained_project):
    """When the resident-bytes budget is exhausted, new POSTs get 503
    (connection closed) instead of buffering unboundedly."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from amcpy_tpu.server import AMCServer

    cfg, model_id = trained_project
    srv = AMCServer(
        cfg, model_id, host="127.0.0.1", port=0,
        max_resident_bytes=1024,  # tiny budget
    )
    host, port = srv.address
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = np.zeros(2 * 256, np.complex64)  # 4 KB > 1 KB budget
        body = (body + 1).astype(np.complex64).tobytes()
        req = urllib.request.Request(
            f"http://{host}:{port}/classify", data=body, method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert "overloaded" in json.loads(e.read())["error"]
    finally:
        srv.shutdown()


def test_pipeline_wire_path_matches_f32(trained_project):
    """Large feature-path request batches ride the int24 wire program
    (_pipeline_logits_wire); predictions must match the f32 pipeline
    within the codec's parity budget — here asserted as identical labels
    and close logits on the same frames."""
    cfg, model_id = trained_project
    wire_cfg = cfg.replace(
        compute={"kernel": "fused", "wire_format": "int24"}
    )
    f32_cfg = cfg.replace(
        compute={"kernel": "fused", "wire_format": "f32"}
    )
    pipe_w = AMCPipeline.from_checkpoint(wire_cfg, model_id)
    pipe_f = AMCPipeline.from_checkpoint(f32_cfg, model_id)
    pipe_w.multi_device = pipe_f.multi_device = False
    assert pipe_w._wire == "int24" and pipe_f._wire == "f32"

    raw = io_mat.load_modulation(cfg, "QPSK")  # (16, 30, 256)
    frames = np.tile(raw.reshape(-1, 256), (2, 1))[:512]  # >= WIRE_MIN_BATCH
    assert pipe_w._wire_eligible(512, 256)
    lw = np.asarray(pipe_w.logits(frames))
    lf = np.asarray(pipe_f.logits(frames))
    assert lw.shape == lf.shape == (512, 6)
    # codec error is ~1e-6 of the feature scale; logits move accordingly
    np.testing.assert_allclose(lw, lf, rtol=1e-3, atol=1e-3)
    assert (lw.argmax(-1) == lf.argmax(-1)).mean() > 0.99
    # small batches stay on the f32 fast path even with wire configured
    assert not pipe_w._wire_eligible(64, 256)
