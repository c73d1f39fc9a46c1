"""Serving: end-to-end raw-IQ -> modulation-label inference.

The reference had no serving path — classification outside training
happened only on the ARM firmware. This module packages the full chain
(fused feature extraction -> persisted standardizer -> classifier) into a
single jitted device program for production/streaming use:

    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    labels = pipe.predict(frames)            # (B, N) complex or (B, 2, N)
    probs = pipe.predict_proba(frames)
    pipe.classify_stream("capture.bin")      # GNU Radio complex64 capture

One device dispatch per batch; frames never round-trip between stages.
The jitted program is module-level (keyed on the model architecture and
kernel statics), so multiple pipeline instances share one compile cache,
and ``classify_stream`` reads captures in bounded chunks — multi-GB files
never materialize in host memory.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amcpy_tpu.config import Config
from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.ops.features import extract_features_planar
from amcpy_tpu.preprocessing import Standardizer

__all__ = ["AMCPipeline"]


@partial(
    jax.jit,
    static_argnames=("model", "kernel", "gmax_mode", "interpret"),
)
def _pipeline_logits(
    model: AMCClassifier,
    iq: jax.Array,
    params,
    batch_stats,
    cols: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    *,
    kernel: str = "xla",
    gmax_mode: str = "matmul",
    interpret: bool = False,
) -> jax.Array:
    """Fused extract -> standardize -> classify. Module-level so every
    :class:`AMCPipeline` instance with the same architecture/kernel statics
    shares one compiled program (no per-instance recompiles).

    Raw-IQ model families (:class:`~amcpy_tpu.models.cnn.IQConvNet`)
    consume the planar frames directly — no feature or standardize stage."""
    from amcpy_tpu.models.cnn import IQConvNet

    if isinstance(model, IQConvNet):
        from amcpy_tpu.ops.cnn_infer import cnn_logits_fused, supports_fused

        if kernel == "fused" and not interpret and supports_fused(model):
            # one-VMEM-pass trunk: 3.2x the flax apply on TPU in steady
            # state (the flax path round-trips ~3.6 GB of activations
            # through HBM per 4096-frame batch — ops/cnn_infer.py).
            # Gated to compiled-Mosaic backends with kernel="fused"
            # (the "auto" default resolves to it on TPU): kernel="xla"
            # keeps the flax forward as the escape hatch, and CPU
            # serving never pays the interpret-mode Pallas tax.
            return cnn_logits_fused(
                model,
                {"params": params, "batch_stats": batch_stats},
                iq,
            )
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, iq, train=False
        )
    if kernel == "fused":
        from amcpy_tpu.ops.fft import best_factorization
        from amcpy_tpu.ops.fused import extract_features_fused

        if best_factorization(iq.shape[-1]) is not None:
            feats = extract_features_fused(
                iq[:, 0, :], iq[:, 1, :], interpret=interpret
            )
        else:  # unfactorizable frame size: XLA handles any N
            feats = extract_features_planar(iq, gmax_mode=gmax_mode)
    elif kernel == "pallas":
        from amcpy_tpu.ops.pallas_features import extract_features_pallas

        feats = extract_features_pallas(
            iq, gmax_mode=gmax_mode, interpret=interpret
        )
    else:
        feats = extract_features_planar(iq, gmax_mode=gmax_mode)
    x = (feats[:, cols] - mean) / std
    return model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )


@partial(jax.jit, static_argnames=("model", "wire", "interpret"))
def _pipeline_logits_wire(
    model: AMCClassifier,
    hi_i: jax.Array,
    lo_i: jax.Array,
    hi_q: jax.Array,
    lo_q: jax.Array,
    s: jax.Array,
    params,
    batch_stats,
    cols: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    *,
    wire: str = "int24",
    interpret: bool = False,
) -> jax.Array:
    """Wire-codec serving program: block-float integer planes arrive on
    device, dequantize in-program (``ops/wire.py``), then run the same
    fused extract -> standardize -> classify chain. Used for large
    feature-path request batches on transfer-bound backends — 25% fewer
    bytes per request than f32 planes (gating evidence:
    ``metrics/wire_gate.json`` + PARITY_r5)."""
    from amcpy_tpu.ops.fused import extract_features_fused
    from amcpy_tpu.ops.wire import decode_plane

    i = decode_plane(hi_i, lo_i, s, fmt=wire)
    q = decode_plane(hi_q, lo_q, s, fmt=wire)
    feats = extract_features_fused(i, q, interpret=interpret)
    x = (feats[:, cols] - mean) / std
    return model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )


class AMCPipeline:
    """Fused extract+standardize+classify inference pipeline."""

    def __init__(
        self,
        model: AMCClassifier,
        params,
        batch_stats,
        scaler: Standardizer,
        cfg: Config,
    ):
        self.model = model
        # normalize to host arrays: params handed straight from train()
        # carry the training mesh's Explicit-axes sharding, which would
        # poison the serving jit's single-device dispatch (the checkpoint
        # path always yields host arrays; make direct construction match)
        self.params = jax.tree.map(np.asarray, params)
        self.batch_stats = jax.tree.map(np.asarray, batch_stats)
        self.scaler = scaler
        self.cfg = cfg
        self._cols = jnp.asarray(list(cfg.features.used_columns))
        self._mean = jnp.asarray(scaler.mean, jnp.float32)
        self._std = jnp.asarray(scaler.std, jnp.float32)
        from amcpy_tpu.extraction import resolve_kernel

        # "auto" = fused on accelerators, xla on CPU (matches extraction)
        self._kernel = resolve_kernel(cfg.compute.kernel)
        # Mosaic is TPU-only: every Pallas path (fused/pallas extraction,
        # the fused CNN trunk) runs interpreted off-TPU
        self._interpret = jax.default_backend() == "cpu"
        #: use every local device for large request batches (round-robin
        #: chunk dispatch); set False to pin inference to one device
        self.multi_device = True
        self._dev_consts: dict = {}
        from amcpy_tpu.ops.wire import resolve_wire_format

        #: wire codec for LARGE feature-path request batches (>=
        #: WIRE_MIN_BATCH frames): same parity-gated int24 block-float
        #: as extraction; small requests keep the f32 fast path (encode
        #: overhead exceeds the wire saving below the threshold)
        self._wire = resolve_wire_format(cfg.compute.wire_format)
        if self._wire != "int24":
            self._wire = "f32"  # serving implements the gated format only

    @classmethod
    def from_checkpoint(
        cls, cfg: Config, model_id: str | None = None
    ) -> "AMCPipeline":
        from amcpy_tpu.train.checkpoint import load_checkpoint, resolve_model_id

        model_id = resolve_model_id(cfg, model_id)
        model, state, scaler, _ = load_checkpoint(cfg, model_id)
        return cls(model, state.params, state.batch_stats, scaler, cfg)

    # ------------------------------------------------------------------

    def _to_planar_host(self, frames: np.ndarray) -> np.ndarray:
        """Normalize input to host-side ``(B, 2, N)`` float32 planar —
        device placement happens in ``_dispatch`` (which may wire-encode
        first)."""
        frames = np.asarray(frames)
        if np.iscomplexobj(frames):
            from amcpy_tpu.data.native_io import planarize

            frames = planarize(frames)
        if frames.ndim != 3 or frames.shape[-2] != 2:
            raise ValueError(
                f"expected (B, N) complex or (B, 2, N) planar, got "
                f"{frames.shape}"
            )
        return np.asarray(frames, np.float32)

    #: smallest compiled batch bucket; arbitrary sizes pad up to the next
    #: power of two, so N distinct request sizes trigger at most
    #: log2(max/min) compiled programs instead of N retraces
    MIN_BUCKET = 64
    #: below this many frames the f32 fast path wins: the host encode +
    #: the extra device arrays cost more than the 25% wire saving.
    #: Above it the codec wins on the tunneled wire: an interleaved
    #: on-TPU A/B (8 alternating reps, 4096-frame requests, same
    #: process — cancels the tunnel's 3x episode drift) measured
    #: median 7.83 s/request wire vs 9.51 s f32 = 1.215x.
    WIRE_MIN_BATCH = 512

    def _wire_eligible(self, b: int, n: int) -> bool:
        if self._wire != "int24" or b < self.WIRE_MIN_BATCH:
            return False
        from amcpy_tpu.models.cnn import IQConvNet

        if isinstance(self.model, IQConvNet):
            return False  # raw-IQ family consumes f32 planes directly
        if self._kernel != "fused":
            return False
        from amcpy_tpu.ops.fft import best_factorization

        return best_factorization(n) is not None

    def _dispatch(self, iq: np.ndarray, consts=None, device=None) -> jax.Array:
        """Bucket-pad a HOST batch, (optionally) wire-encode, place on
        ``device`` (default device when None) and run the fused program."""
        b = iq.shape[0]
        bucket = max(self.MIN_BUCKET, 1 << max(b - 1, 0).bit_length())
        iq = np.asarray(iq)
        if bucket != b:
            # repeat the last frame: numerically benign padding (zero
            # frames hit 0/0 in the normalized-amplitude stream)
            iq = np.concatenate(
                [iq, np.repeat(iq[-1:], bucket - b, axis=0)]
            )
        params, batch_stats, cols, mean, std = consts or (
            self.params, self.batch_stats, self._cols, self._mean,
            self._std,
        )

        def put(x):
            return jax.device_put(x, device) if device is not None else (
                jnp.asarray(x)
            )

        if self._wire_eligible(bucket, iq.shape[-1]):
            from amcpy_tpu.ops.wire import encode_planes

            enc = encode_planes(
                np.ascontiguousarray(iq[:, 0, :]),
                np.ascontiguousarray(iq[:, 1, :]),
                "int24",
            )
            out = _pipeline_logits_wire(
                self.model, *(put(e) for e in enc),
                params, batch_stats, cols, mean, std,
                wire="int24", interpret=self._interpret,
            )
        else:
            out = _pipeline_logits(
                self.model, put(iq), params, batch_stats, cols, mean, std,
                kernel=self._kernel,
                gmax_mode=self.cfg.compute.gmax_mode,
                interpret=self._interpret,
            )
        return out[:b]

    def _consts_on(self, dev):
        """Model constants committed to one device (cached; ~KBs)."""
        if dev not in self._dev_consts:
            self._dev_consts[dev] = jax.device_put(
                (
                    self.params, self.batch_stats, self._cols,
                    self._mean, self._std,
                ),
                dev,
            )
        return self._dev_consts[dev]

    def logits(self, frames: np.ndarray) -> "jax.Array | np.ndarray":
        iq = self._to_planar_host(frames)
        b = iq.shape[0]
        devs = jax.local_devices()
        if (
            self.multi_device
            and len(devs) > 1
            # break-even: every device must receive at least a full
            # minimum bucket, or the per-chunk pad work exceeds the
            # single-device dispatch (review r4)
            and b >= len(devs) * self.MIN_BUCKET
        ):
            # batch-parallel serving: round-robin contiguous chunks over
            # every local device; dispatches are async, so all devices
            # run concurrently and results gather in order. (Scale-out
            # ACROSS hosts stays one server process per host behind an
            # ordinary load balancer.) NOTE: the cross-device gather
            # blocks, so callers that pipeline around an un-fetched
            # device array (classify_stream) lose read/compute overlap
            # on multi-device hosts — in exchange each chunk finishes
            # len(devs)x faster.
            bounds = np.linspace(0, b, len(devs) + 1).astype(int)
            outs = [
                self._dispatch(
                    iq[lo:hi], self._consts_on(dev), device=dev
                )
                for dev, lo, hi in zip(devs, bounds[:-1], bounds[1:])
                if hi > lo
            ]
            # chunks live on different devices: gather on the host (every
            # dispatch is already in flight before the first fetch); the
            # result stays a host array — re-uploading logits nobody
            # computes on would be a wasted H2D round trip
            return np.concatenate([np.asarray(o) for o in outs], axis=0)
        return self._dispatch(iq)

    def predict(self, frames: np.ndarray) -> np.ndarray:
        """Predicted class ids, one per frame."""
        return np.asarray(jnp.argmax(self.logits(frames), axis=-1))

    def predict_proba(self, frames: np.ndarray) -> np.ndarray:
        return np.asarray(jax.nn.softmax(self.logits(frames), axis=-1))

    def predict_names(self, frames: np.ndarray) -> list[str]:
        mods = self.cfg.signals.modulations_with_noise
        return [mods[k] for k in self.predict(frames)]

    # ------------------------------------------------------------------

    def classify_stream(
        self,
        path: str | Path,
        *,
        frame_size: int | None = None,
        skip: int = 2400,
        batch_size: int = 4096,
    ) -> np.ndarray:
        """Classify a GNU Radio complex64 capture file; returns class ids
        per frame.

        Bounded memory: frames are read (native framer when available) and
        classified in ``batch_size`` chunks — only one chunk of planar IQ
        is ever resident on the host, so multi-GB captures stream through.
        JAX's async dispatch overlaps the next chunk's file read with the
        current chunk's device compute.
        """
        from amcpy_tpu.data.native_io import read_stream_frames

        frame_size = frame_size or self.cfg.signals.frame_size
        total = max(
            (Path(path).stat().st_size // 8 - skip) // frame_size, 0
        )
        out = np.empty(total, dtype=np.int64)
        pending: tuple[int, jax.Array] | None = None
        for start in range(0, total, batch_size):
            count = min(batch_size, total - start)
            chunk = read_stream_frames(
                path, frame_size,
                skip=skip + start * frame_size, max_frames=count,
            )
            logit = self.logits(chunk)
            if pending is not None:
                p_start, p_logit = pending
                pred = np.asarray(jnp.argmax(p_logit, axis=-1))
                out[p_start : p_start + len(pred)] = pred
            pending = (start, logit)
        if pending is not None:
            p_start, p_logit = pending
            pred = np.asarray(jnp.argmax(p_logit, axis=-1))
            out[p_start : p_start + len(pred)] = pred
        return out
