"""Structured metrics logging and lightweight stage timing.

The reference's observability was bare ``print`` lines and a per-process
``time.process_time()`` stamp (``feature_extraction.py:44,82``). Here every
pipeline stage emits a structured JSONL record (wall time, throughput,
shapes) to ``metrics/run.jsonl``, and hot regions can be wrapped in
``jax.profiler`` traces for XProf inspection.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Iterator

import jax

__all__ = ["MetricsLogger", "stage_timer", "trace_region"]


class MetricsLogger:
    """Append-only JSONL metrics sink. Safe to construct cheaply anywhere."""

    def __init__(self, path: str | Path | None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, event: str, **fields: Any) -> dict[str, Any]:
        rec = {"ts": time.time(), "event": event, **fields}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec


@contextlib.contextmanager
def stage_timer(
    logger: MetricsLogger | None, event: str, **fields: Any
) -> Iterator[dict[str, Any]]:
    """Time a pipeline stage (wall-clock, not the reference's misleading
    ``process_time``) and log it. The dict yielded can be extended with
    result fields (e.g. frames/sec) before the block exits."""
    rec: dict[str, Any] = dict(fields)
    t0 = time.perf_counter()
    try:
        yield rec
    finally:
        rec["wall_s"] = time.perf_counter() - t0
        if logger:
            logger.log(event, **rec)


@contextlib.contextmanager
def trace_region(name: str) -> Iterator[None]:
    """Named profiler region (shows up in XProf / jax.profiler traces)."""
    with jax.named_scope(name):
        yield
