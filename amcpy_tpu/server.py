"""HTTP classification server — `amc serve`.

A production front door for :class:`~amcpy_tpu.serve.AMCPipeline`: raw IQ
frames in, modulation labels/probabilities out, over plain HTTP with zero
extra dependencies (stdlib ``http.server``). The reference had no serving
path at all — classification outside training happened only on ARM
firmware (``/root/reference/arm-data/*.m`` analyzes its prediction dumps).

Design:

* **One device program, many requests.** All requests funnel into the
  shared :class:`AMCPipeline`, whose jitted program is module-level and
  whose batches pad to power-of-two buckets — a mix of request sizes
  compiles at most ~4 programs, and the TPU sees large fused
  extract→standardize→classify dispatches.
* **A single inference lock.** TPU programs are not concurrency-winners
  at this model size; serialized device access with threaded HTTP IO
  keeps ordering simple and latency predictable. (Scale-out = one server
  process per chip behind any ordinary load balancer.)
* **Wire format.** POST body is raw little-endian bytes, shape inferred
  from ``frame_size``: ``complex64`` interleaved I/Q (``format=c64``, the
  GNU Radio capture layout, default) or planar ``float32`` ``(B, 2, N)``
  (``format=planar``). Responses are JSON.

Endpoints:

* ``GET  /healthz``        — liveness + model/config summary
* ``POST /classify``       — ``?format=c64|planar&probs=1`` → labels (+ probabilities)

Run: ``amc serve [--model-id ID] [--port 8000]``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

import numpy as np

from amcpy_tpu.config import Config
from amcpy_tpu.serve import AMCPipeline

__all__ = ["AMCServer", "serve_forever"]


class AMCServer:
    """Wraps an :class:`AMCPipeline` in a threaded HTTP server."""

    def __init__(
        self,
        cfg: Config,
        model_id: str | None = None,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_body: int = 256 << 20,
        warmup: bool = True,
    ):
        self.cfg = cfg
        self.pipe = AMCPipeline.from_checkpoint(cfg, model_id)
        self.mods = list(cfg.signals.modulations_with_noise)
        self.frame_size = cfg.signals.frame_size
        self.max_body = max_body
        self._infer_lock = threading.Lock()
        self._requests = 0
        self._frames = 0
        # bind the socket FIRST so early clients queue in the accept
        # backlog (a load balancer health-checking during startup sees a
        # slow connect, not ECONNREFUSED), THEN warm the compile cache
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True
        if warmup:
            # compile the smallest bucket before serving traffic so the
            # first request doesn't pay the trace+compile (measured ~20 s
            # on a cold TPU process for the fused pipeline)
            dummy = np.zeros(
                (1, 2, self.frame_size), np.float32
            )
            dummy[:, 0, 0] = 1.0  # non-degenerate frame (RMS > 0)
            self.pipe.predict(dummy)

    @property
    def address(self) -> tuple[str, int]:
        return self.httpd.server_address[:2]

    # ------------------------------------------------------------------

    def classify(
        self, body: bytes, fmt: str, frame_size: int, want_probs: bool
    ) -> dict[str, Any]:
        if fmt == "c64":
            if len(body) % (8 * frame_size):
                raise ValueError(
                    f"body is {len(body)} bytes — not a whole number of "
                    f"complex64 frames of {frame_size} samples"
                )
            frames = np.frombuffer(body, dtype=np.complex64).reshape(
                -1, frame_size
            )
        elif fmt == "planar":
            if len(body) % (8 * frame_size):
                raise ValueError(
                    f"body is {len(body)} bytes — not a whole number of "
                    f"planar f32 (2, {frame_size}) frames"
                )
            frames = np.frombuffer(body, dtype=np.float32).reshape(
                -1, 2, frame_size
            )
        else:
            raise ValueError(f"unknown format {fmt!r} (use c64|planar)")
        if frames.shape[0] == 0:
            raise ValueError("empty request")
        with self._infer_lock:
            if want_probs:
                probs = self.pipe.predict_proba(frames)
                pred = probs.argmax(-1)
            else:
                probs = None
                pred = self.pipe.predict(frames)
            self._requests += 1
            self._frames += int(frames.shape[0])
        out: dict[str, Any] = {
            "labels": [self.mods[int(k)] for k in pred],
            "class_ids": [int(k) for k in pred],
        }
        if probs is not None:
            out["probs"] = np.round(probs, 6).tolist()
        return out

    def health(self) -> dict[str, Any]:
        import jax

        return {
            "status": "ok",
            "backend": jax.default_backend(),
            "frame_size": self.frame_size,
            "classes": self.mods,
            "requests": self._requests,
            "frames_classified": self._frames,
        }

    # ------------------------------------------------------------------

    def serve_forever(self) -> None:  # pragma: no cover - blocking loop
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


def _make_handler(server: AMCServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet; metrics via /healthz
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._reply(200, server.health())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/classify":
                # body not drained: kill this keep-alive connection so
                # leftover bytes can't be parsed as the next request
                self.close_connection = True
                self._reply(404, {"error": "unknown path"})
                return
            body_read = False
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length <= 0:
                    raise ValueError("missing body")
                if length > server.max_body:
                    raise ValueError(
                        f"body {length} bytes exceeds limit "
                        f"{server.max_body}"
                    )
                q = parse_qs(url.query)
                fmt = q.get("format", ["c64"])[0]
                frame_size = int(
                    q.get("frame_size", [server.frame_size])[0]
                )
                if frame_size <= 0:
                    raise ValueError(f"frame_size must be > 0, got {frame_size}")
                want_probs = q.get("probs", ["0"])[0] in ("1", "true")
                body = self.rfile.read(length)
                body_read = True
                self._reply(
                    200,
                    server.classify(body, fmt, frame_size, want_probs),
                )
            except ValueError as exc:
                if not body_read:
                    self.close_connection = True
                self._reply(400, {"error": str(exc)})
            except Exception as exc:  # pragma: no cover - defensive
                if not body_read:
                    self.close_connection = True
                self._reply(500, {"error": repr(exc)})

    return Handler


def serve_forever(
    cfg: Config,
    model_id: str | None = None,
    host: str = "0.0.0.0",
    port: int = 8000,
) -> None:  # pragma: no cover - blocking entry
    srv = AMCServer(cfg, model_id, host=host, port=port)
    h, p = srv.address
    print(f"amc serve: listening on http://{h}:{p} "
          f"(POST /classify, GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
        srv.shutdown()
