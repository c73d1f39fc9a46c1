"""Extraction runtime — the sharded, batched replacement for the
reference's process/thread farm.

The reference (``/root/reference/src/amcpy/feature_extraction.py:22-99``)
spawns one OS process per modulation, each running 8 Python threads that
pull single frames off a queue and call per-frame NumPy feature functions
(96k interpreter round-trips). Here the whole dataset is one
``(mods*snr*frames, frame_size)`` complex batch laid out in HBM, sharded
over the mesh's ``data`` axis, and pushed through the fused extractor in a
few large device steps. The per-modulation ``.mat`` artifacts keep the
reference layout for MATLAB interop.

Failure handling: per-modulation outputs are idempotent — a re-run skips
modulations whose artifact already exists (``force=True`` overrides), so a
crashed run resumes at stage granularity (the reference simply lost the
output of a crashed process, SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax

from amcpy_tpu.config import Config
from amcpy_tpu.data import io_mat
from amcpy_tpu.ops.features import NUM_FEATURES, extract_features_planar
from amcpy_tpu.parallel.mesh import make_mesh, shard_batch
from amcpy_tpu.utils.metrics import MetricsLogger, stage_timer

__all__ = [
    "extract_batch",
    "prepare_frames",
    "PreparedBatch",
    "resolve_kernel",
    "run_extraction",
    "run_extraction_synthetic",
]


def backend_is_tpu() -> bool:
    """True when the default backend drives TPU hardware — including
    tunneled PJRT plugins whose platform name is not literally "tpu"
    (the axon relay reports platform "axon" but a TPU device_kind)."""
    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    return "tpu" in d.platform.lower() or "tpu" in str(d.device_kind).lower()


def resolve_kernel(kernel: str) -> str:
    """The single source of truth for ``kernel="auto"``: the full-fusion
    Pallas kernel on TPU backends (fastest measured single-chip
    configuration, BENCH r3/r4), the XLA kernel everywhere else — Mosaic
    kernels are TPU-only, so a GPU backend must route to XLA rather than
    fail at lowering (ADVICE r4), and on CPU Mosaic only runs
    interpreted. Used by extraction, serving, and ``amc info`` so the
    diagnostic can never disagree with the routing."""
    if kernel == "auto":
        return "fused" if backend_is_tpu() else "xla"
    return kernel

_FUSED_PROBE_CACHE: dict[int, bool] = {}


def _fused_compiles(frame_size: int, interpret: bool) -> bool:
    """Probe (once per frame size) that the fused Mosaic kernel compiles
    and runs on this backend. Interpret mode always works."""
    if interpret:
        return True
    ok = _FUSED_PROBE_CACHE.get(frame_size)
    if ok is None:
        import jax.numpy as jnp

        from amcpy_tpu.ops.fused import extract_features_fused

        try:
            z = jnp.zeros((8, frame_size), jnp.float32)
            jax.block_until_ready(extract_features_fused(z, z))
            ok = True
        except Exception as exc:  # pragma: no cover - backend-specific
            print(
                f"[extraction] fused kernel unavailable for N={frame_size} "
                f"({type(exc).__name__}); using the XLA kernel"
            )
            ok = False
        _FUSED_PROBE_CACHE[frame_size] = ok
    return ok


def _kernel_fn(
    mesh, kernel: str, normalize_scale: bool, gmax_mode: str,
    wire: str = "f32",
):
    """Resolve the per-chunk extractor for the configured kernel + mesh.

    Routing (VERDICT r1 item 2 — every kernel is reachable from the
    product path):

    * mesh ``seq`` axis > 1  -> the sequence-parallel shard_map kernel
      (``parallel/sp.py``), frames sharded over both axes;
    * ``kernel="fused"``     -> the full-fusion Pallas kernel
      (``ops/fused.py``: stats + in-kernel MXU matmul-DFT, one VMEM pass,
      separate I/Q planes — the fastest single-chip kernel, bench r3);
      falls back to ``xla`` when the frame size has no N1 x N2
      factorization;
    * ``kernel="pallas"``    -> the round-2 Pallas kernel (packed planar
      input, XLA spectral epilogue), shard_map-wrapped over ``data`` when
      the mesh is multi-device (pallas_call is a custom call XLA cannot
      auto-partition);
    * ``kernel="xla"``       -> the fused XLA program (default). On a
      multi-device mesh this is also shard_map-wrapped over ``data``:
      frames are independent, and the SPMD partitioner otherwise
      ALL-GATHERS the whole batch onto every device for the FFT op
      (audited on the 8-device mesh — ``tests/test_scaling_audit.py``),
      turning an embarrassingly parallel program into an O(B*N)
      collective. shard_map pins the per-shard execution and lowers to
      zero collectives for every gmax mode.

    Returns ``(fn, seq_sharded, wants_planes)`` — ``wants_planes`` kernels
    take separate ``(B, N)`` I and Q arrays instead of packed
    ``(B, 2, N)``.

    ``kernel="auto"`` (the config default) resolves to the full-fusion
    Pallas kernel on accelerator backends — the fastest measured
    single-chip configuration (BENCH r3) — and to the XLA kernel on CPU
    (where Pallas only runs interpreted). The fused path additionally
    probes its Mosaic compile once per frame size and silently falls
    back to XLA if the lowering fails, so an exotic shape can never
    break extraction.
    """
    kernel = resolve_kernel(kernel)
    seq_sharded = len(mesh.axis_names) > 1 and mesh.shape[mesh.axis_names[-1]] > 1
    if seq_sharded:
        from amcpy_tpu.parallel.sp import extract_features_sp

        def fn(arr):
            return extract_features_sp(
                arr, mesh,
                normalize_scale=normalize_scale, gmax_mode=gmax_mode,
            )

        return fn, True, False
    if kernel == "fused":
        import functools

        from jax.sharding import PartitionSpec as P

        from amcpy_tpu.ops.fft import best_factorization
        from amcpy_tpu.ops.fused import extract_features_fused

        interpret = jax.default_backend() == "cpu"  # Mosaic is TPU-only
        base = functools.partial(
            extract_features_fused,
            normalize_scale=normalize_scale,
            interpret=interpret,
        )
        data_axis = mesh.axis_names[0]
        if wire != "f32":
            # wire-codec variant: inputs arrive as block-float integers
            # (ops/wire.py) and dequantize ON DEVICE inside the same
            # shard_map program as the kernel — the caller
            # (extract_batch) has already settled the fused-route
            # fallback, so no per-call rerouting here
            from amcpy_tpu.ops.wire import decode_plane

            n_enc = 4 if wire == "int24" else 2

            def base_wire(*enc):
                half = n_enc // 2
                i = decode_plane(*enc[:half], enc[-1], fmt=wire)
                q = decode_plane(*enc[half:-1], enc[-1], fmt=wire)
                return base(i, q)

            inner = jax.shard_map(
                base_wire, mesh=mesh,
                in_specs=tuple(P(data_axis) for _ in range(n_enc + 1)),
                out_specs=P(data_axis),
                check_vma=False,
            )
            return jax.jit(inner), False, True
        # ALWAYS shard_map (even on a 1-device mesh): pallas_call requires
        # every mesh axis to be Manual, and the pipeline's explicit-axis
        # meshes would otherwise reject it outright
        inner = jax.shard_map(
            base, mesh=mesh,
            in_specs=(P(data_axis), P(data_axis)),
            out_specs=P(data_axis),
            check_vma=False,
        )
        fused_fn = jax.jit(inner)

        def fn(i, q):
            # fall back to the XLA kernel (handles any N via the FFT)
            # when the frame has no N1 x N2 factorization, or if the
            # Mosaic compile probe fails on this backend/shape
            n = i.shape[-1]
            if best_factorization(n) is None or not _fused_compiles(
                n, interpret
            ):
                xla_fn, _, _ = _kernel_fn(mesh, "xla", normalize_scale, gmax_mode)
                import jax.numpy as jnp

                return xla_fn(jnp.stack([i, q], axis=-2))
            return fused_fn(i, q)

        return fn, False, True
    if kernel == "pallas":
        import functools

        from jax.sharding import PartitionSpec as P

        from amcpy_tpu.ops.pallas_features import extract_features_pallas

        interpret = jax.default_backend() == "cpu"  # Mosaic is TPU-only
        base = functools.partial(
            extract_features_pallas,
            normalize_scale=normalize_scale,
            gmax_mode=gmax_mode,
            interpret=interpret,
        )
        data_axis = mesh.axis_names[0]
        # ALWAYS shard_map (even 1-device): pallas_call requires Manual
        # mesh axes; see the fused branch above
        inner = jax.shard_map(
            base, mesh=mesh,
            in_specs=P(data_axis), out_specs=P(data_axis),
            # pallas_call can't declare varying-mesh-axes metadata
            check_vma=False,
        )
        return jax.jit(inner), False, False
    if kernel != "xla":
        raise ValueError(f"unknown extraction kernel {kernel!r}")

    def fn(arr):
        return extract_features_planar(
            arr, normalize_scale=normalize_scale, gmax_mode=gmax_mode
        )

    data_axis = mesh.axis_names[0]
    if mesh.shape[data_axis] > 1:
        from jax.sharding import PartitionSpec as P

        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=P(data_axis), out_specs=P(data_axis)
        )), False, False
    return fn, False, False


def _default_chunk_size(mesh, frame_size: int) -> int:
    n_data = mesh.devices.size // (
        mesh.shape[mesh.axis_names[-1]]
        if len(mesh.axis_names) > 1 else 1
    )
    if jax.default_backend() == "cpu":
        # ~2M samples per DEVICE step: when the (chunk, N)-sized
        # elementwise temporaries fit XLA's alternate-memory (VMEM)
        # assignment, no intermediate round-trips HBM (bench round 2:
        # 1024-frame chunks at N=2048 run 7.6-9.8M frames/s vs 3.7M
        # at 4096); also keeps the CPU-mesh test suite snappy.
        samples = 1 << 21
    else:
        # Accelerators: ~32M samples (256 MB planar) per host slab.
        # The end-to-end flow is WIRE-bound on tunneled backends
        # (~11 MB/s single-stream), and put_global splits a slab this
        # size into ~8 concurrent 32 MB streams (~3x aggregate wire
        # bandwidth, scripts/host_path_probe.py). The fused kernel is
        # batch-flat (BENCH r3: 7.6M frames/s at 16384), so the
        # larger device step costs nothing while transfer dominates.
        samples = 1 << 25
    return max(256, samples // max(frame_size, 1) * n_data)


def _settle_wire(mesh, kernel: str, wire: str, frame_size: int) -> str:
    """Final wire codec for this call: the codec only applies when the
    fused route will actually be taken (its decode is compiled into the
    shard_map program, so there is no per-call fallback)."""
    from amcpy_tpu.ops.wire import resolve_wire_format

    wire = resolve_wire_format(wire)
    if wire == "f32":
        return wire
    seq_probe = (
        len(mesh.axis_names) > 1 and mesh.shape[mesh.axis_names[-1]] > 1
    )
    if resolve_kernel(kernel) != "fused" or seq_probe:
        return "f32"
    from amcpy_tpu.ops.fft import best_factorization

    interpret = jax.default_backend() == "cpu"
    if best_factorization(frame_size) is None or not _fused_compiles(
        frame_size, interpret
    ):
        return "f32"
    return wire


def _prep_chunk(
    frames_slice: np.ndarray,
    mesh,
    wants_planes: bool,
    wire: str,
) -> tuple[tuple[np.ndarray, ...], int]:
    """Host-side phase for one chunk: planarize (+ pad + wire-encode for
    plane kernels). Pure NumPy — safe on a prefetch thread. Returns
    ``(payload_arrays, original_rows)``."""
    from amcpy_tpu.data.native_io import planarize

    if not wants_planes:
        return (planarize(frames_slice),), frames_slice.shape[0]
    from amcpy_tpu.ops.fused import split_planes
    from amcpy_tpu.ops.wire import encode_planes
    from amcpy_tpu.parallel.mesh import pad_to_multiple

    ih, qh = split_planes(frames_slice)
    # pad to the kernel tile multiple on the HOST: device-side padding
    # inside the fused kernel would concatenate arrays of different
    # explicit shardings (rejected under explicit-axis meshes)
    n_data = mesh.shape[mesh.axis_names[0]]
    ih, orig = pad_to_multiple(ih, 64 * n_data)
    qh, _ = pad_to_multiple(qh, 64 * n_data)
    if wire != "f32":
        return encode_planes(ih, qh, wire), orig
    return (ih, qh), orig


class PreparedBatch:
    """Host-prepared chunks for :func:`extract_batch` — planarize, pad
    and wire-encode done ahead of time (build with
    :func:`prepare_frames`, typically on a prefetch thread so the next
    batch's host work overlaps the current batch's uploads)."""

    __slots__ = (
        "b", "frame_size", "wire", "wants_planes", "seq_sharded",
        "chunks", "prep_s",
    )

    def __init__(self, b, frame_size, wire, wants_planes, seq_sharded,
                 chunks, prep_s):
        self.b = b
        self.frame_size = frame_size
        self.wire = wire
        self.wants_planes = wants_planes
        self.seq_sharded = seq_sharded
        #: list of (start_row, payload_arrays, original_rows)
        self.chunks = chunks
        self.prep_s = prep_s


def prepare_frames(
    frames: np.ndarray,
    *,
    mesh=None,
    chunk_size: int | None = None,
    kernel: str = "xla",
    wire: str = "f32",
) -> PreparedBatch:
    """Run :func:`extract_batch`'s host-side phase ahead of time.

    Pure NumPy — call on a prefetch/loader thread and hand the result to
    ``extract_batch`` in place of ``frames``; the caller must pass the
    SAME ``mesh``/``kernel`` there (routing is resolved identically
    here so the prepared payload matches the kernel's input contract).
    """
    import time as _time

    t0 = _time.perf_counter()
    frames = np.asarray(frames)
    if mesh is None:
        mesh = make_mesh()
    if chunk_size is None:
        chunk_size = _default_chunk_size(mesh, frames.shape[-1])
    wire = _settle_wire(mesh, kernel, wire, frames.shape[-1])
    seq_sharded = (
        len(mesh.axis_names) > 1 and mesh.shape[mesh.axis_names[-1]] > 1
    )
    wants_planes = resolve_kernel(kernel) == "fused" and not seq_sharded
    chunks = [
        (start, *_prep_chunk(
            frames[start : start + chunk_size], mesh, wants_planes, wire
        ))
        for start in range(0, frames.shape[0], chunk_size)
    ]
    return PreparedBatch(
        frames.shape[0], frames.shape[-1], wire, wants_planes,
        seq_sharded, chunks, _time.perf_counter() - t0,
    )


def extract_batch(
    frames: "np.ndarray | jax.Array | PreparedBatch",
    *,
    mesh=None,
    chunk_size: int | None = None,
    normalize_scale: bool = True,
    gmax_mode: str = "matmul",
    kernel: str = "xla",
    wire: str = "f32",
    timings: dict | None = None,
) -> np.ndarray:
    """Extract features for a host batch ``(B, N)`` -> ``(B, 18)`` float32.

    Frames are converted to planar I/Q on the host (complex never crosses
    the device boundary — some PJRT backends cannot transfer complex64),
    device_put with the mesh's data-axis sharding, and processed in chunks
    so arbitrarily large datasets stream through HBM. XLA inserts any
    needed collectives from the sharding annotations alone.

    The host path is software-pipelined twice over: a prep thread
    planarizes/pads/encodes chunk k+1 while chunk k uploads, and chunk
    k+1 is dispatched before chunk k's result is fetched (JAX dispatch
    is async). Passing a :class:`PreparedBatch` (from
    :func:`prepare_frames`, e.g. built on a loader thread) skips the
    host phase entirely.

    ``wire`` — host->device codec (``ops/wire.py``): ``int24`` ships
    3 bytes/sample as block-float integers dequantized on device (25%
    fewer bytes on the transfer-bound path), ``int16`` 2 bytes/sample,
    ``auto`` resolves per backend. Applies only when the fused-kernel
    route is taken; other routes upload raw f32.

    ``timings`` — optional dict, filled with a zero-overhead phase
    breakdown of the host path (VERDICT r3 items 1/7):
    ``host_prep_s`` (time BLOCKED on planarize + pad + wire-encode —
    overlapped prep does not appear here; ``prep_total_s`` carries the
    full amount), ``h2d_s`` (device_put calls — includes wire time if
    the backend's put blocks), ``wait_s`` (device_get waits: compute +
    any transfer backlog the pipeline failed to overlap), ``bytes_h2d``
    (actual bytes shipped, after the codec).
    """
    import concurrent.futures as cf
    import time as _time

    if mesh is None:
        mesh = make_mesh()

    t_prep = prep_total = 0.0
    prep_exec: cf.ThreadPoolExecutor | None = None
    if isinstance(frames, PreparedBatch):
        prepared = frames
        b = prepared.b
        wire = prepared.wire
        wants_planes = prepared.wants_planes
        seq_sharded = prepared.seq_sharded
        prep_total = prepared.prep_s

        def chunk_stream():
            yield from prepared.chunks
    else:
        frames = np.asarray(frames)
        b = frames.shape[0]
        if chunk_size is None:
            chunk_size = _default_chunk_size(mesh, frames.shape[-1])
        wire = _settle_wire(mesh, kernel, wire, frames.shape[-1])
        seq_sharded = (
            len(mesh.axis_names) > 1
            and mesh.shape[mesh.axis_names[-1]] > 1
        )
        wants_planes = (
            resolve_kernel(kernel) == "fused" and not seq_sharded
        )
        starts = list(range(0, b, chunk_size))
        prep_exec = cf.ThreadPoolExecutor(1)

        def _prep(start):
            t0 = _time.perf_counter()
            payload, orig = _prep_chunk(
                frames[start : start + chunk_size], mesh,
                wants_planes, wire,
            )
            return start, payload, orig, _time.perf_counter() - t0

        def chunk_stream():
            # prefetch depth 1: chunk k+1 preps on the worker while
            # chunk k uploads — bounds host residency to two chunks
            nonlocal t_prep, prep_total
            fut = prep_exec.submit(_prep, starts[0]) if starts else None
            for i in range(len(starts)):
                t0 = _time.perf_counter()
                start, payload, orig, dt = fut.result()
                t_prep += _time.perf_counter() - t0  # BLOCKED time only
                prep_total += dt
                if i + 1 < len(starts):
                    fut = prep_exec.submit(_prep, starts[i + 1])
                yield start, payload, orig

    kern, seq_k, wants_k = _kernel_fn(
        mesh, kernel, normalize_scale, gmax_mode, wire=wire
    )
    assert (seq_k, wants_k) == (seq_sharded, wants_planes), (
        "prepared batch routing does not match this mesh/kernel"
    )
    out = np.empty((b, NUM_FEATURES), dtype=np.float32)
    t_h2d = t_wait = 0.0
    bytes_h2d = 0
    pending: tuple[int, int, jax.Array] | None = None
    try:
        for start, payload, orig in chunk_stream():
            t1 = _time.perf_counter()
            if wants_planes:
                arrs = [shard_batch(e, mesh)[0] for e in payload]
                t2 = _time.perf_counter()
                bytes_h2d += sum(e.nbytes for e in payload)
                feats = kern(*arrs)
            else:
                arr, orig = shard_batch(
                    payload[0], mesh, seq_sharded=seq_sharded
                )
                t2 = _time.perf_counter()
                bytes_h2d += arr.nbytes
                feats = kern(arr)
            t_h2d += t2 - t1
            if pending is not None:
                p_start, p_orig, p_feats = pending
                t3 = _time.perf_counter()
                out[p_start : p_start + p_orig] = np.asarray(
                    jax.device_get(p_feats)
                )[:p_orig]
                t_wait += _time.perf_counter() - t3
            pending = (start, orig, feats)
        if pending is not None:
            p_start, p_orig, p_feats = pending
            t3 = _time.perf_counter()
            out[p_start : p_start + p_orig] = np.asarray(
                jax.device_get(p_feats)
            )[:p_orig]
            t_wait += _time.perf_counter() - t3
    finally:
        if prep_exec is not None:
            prep_exec.shutdown(wait=True)
    if timings is not None:
        timings["host_prep_s"] = timings.get("host_prep_s", 0.0) + t_prep
        timings["prep_total_s"] = (
            timings.get("prep_total_s", 0.0) + prep_total
        )
        timings["h2d_s"] = timings.get("h2d_s", 0.0) + t_h2d
        timings["wait_s"] = timings.get("wait_s", 0.0) + t_wait
        timings["bytes_h2d"] = timings.get("bytes_h2d", 0) + bytes_h2d
        timings["wire"] = wire
    return out


def run_extraction(
    cfg: Config,
    *,
    mesh=None,
    force: bool = False,
    logger: MetricsLogger | None = None,
    profile_dir: str | None = None,
) -> dict[str, np.ndarray]:
    """Extract features for every modulation in the dataset.

    Returns ``{modulation: (num_snr, num_frames, 18) float32}`` and writes
    the per-modulation ``{MOD}_features.mat`` artifacts.
    """
    import jax as _jax

    cfg.paths.ensure_dirs()
    if logger is None:
        logger = MetricsLogger(cfg.paths.metrics / "run.jsonl")

    # Multi-host: each process extracts a round-robin partition of the
    # modulations on its OWN local devices and writes its artifacts —
    # no host ever reads another host's raw data (the reference re-read
    # the entire dataset in every worker process,
    # feature_extraction.py:46-48), and no cross-host collectives are
    # needed for this embarrassingly-parallel stage.
    nproc = _jax.process_count()
    pidx = _jax.process_index()
    s = cfg.signals
    all_mods = list(s.modulations_with_noise)
    local_mods = [m for i, m in enumerate(all_mods) if i % nproc == pidx]
    if mesh is None:
        if nproc > 1:
            local = np.asarray(_jax.local_devices())
            mesh = _jax.sharding.Mesh(
                local.reshape(len(local), 1),
                (cfg.compute.data_axis, cfg.compute.seq_axis),
            )
        else:
            mesh = make_mesh(cfg)

    results: dict[str, np.ndarray] = {}
    todo: list[str] = []
    for mod in local_mods:
        out_path = cfg.paths.calculated_features / f"{mod}_features.mat"
        if out_path.exists() and not force:
            try:
                results[mod] = io_mat.load_features(cfg, mod)
                logger.log("extract_skip", modulation=mod, path=str(out_path))
                continue
            except Exception as exc:  # corrupt artifact: recompute
                logger.log(
                    "extract_corrupt_artifact",
                    modulation=mod,
                    error=repr(exc),
                )
                print(f"[{mod}] corrupt artifact, recomputing: {exc}")
        todo.append(mod)

    # Pipeline the per-mod `.mat` reads AND the host prep (planarize +
    # pad + wire-encode) under the device work: a loader thread fully
    # prepares modulation k+1 while k streams to the device and extracts
    # — the reference instead re-read the ENTIRE dataset file in every
    # worker process (feature_extraction.py:46-48).
    import concurrent.futures as cf

    def _load_prepared(mod: str):
        raw = io_mat.load_modulation(cfg, mod)  # (S, F, N)
        flat = raw.reshape(-1, raw.shape[-1])
        return raw.shape, prepare_frames(
            flat, mesh=mesh, kernel=cfg.compute.kernel,
            wire=cfg.compute.wire_format,
        )

    loader = cf.ThreadPoolExecutor(1)
    try:
        fut = loader.submit(_load_prepared, todo[0]) if todo else None
        for k, mod in enumerate(todo):
            (n_snr, n_frames, n), prepared = fut.result()
            fut = (
                loader.submit(_load_prepared, todo[k + 1])
                if k + 1 < len(todo)
                else None
            )
            prof = (
                _jax.profiler.trace(profile_dir)
                if profile_dir
                else contextlib.nullcontext()
            )
            with prof, stage_timer(logger, "extract", modulation=mod) as rec:
                tim: dict = {}
                feats = extract_batch(
                    prepared,
                    mesh=mesh,
                    normalize_scale=cfg.compute.normalize_scale,
                    gmax_mode=cfg.compute.gmax_mode,
                    kernel=cfg.compute.kernel,
                    timings=tim,
                )
                rec["frames"] = int(n_snr * n_frames)
                rec.update(
                    {
                        key: round(v, 4) if isinstance(v, float) else v
                        for key, v in tim.items()
                    }
                )
            fps = rec["frames"] / max(rec["wall_s"], 1e-9)
            split = ""
            if tim.get("h2d_s", 0) + tim.get("wait_s", 0) > 0.5:
                split = (
                    f" [h2d {tim['h2d_s']:.1f}s, prep "
                    f"{tim['host_prep_s']:.1f}s, wait {tim['wait_s']:.1f}s]"
                )
            print(f"[{mod}] {rec['frames']} frames in {rec['wall_s']:.2f}s "
                  f"({fps:,.0f} frames/s){split}")
            feats = feats.reshape(n_snr, n_frames, NUM_FEATURES)
            io_mat.save_features(cfg, mod, feats)
            results[mod] = feats
    finally:
        loader.shutdown(wait=True)

    if nproc > 1:
        # Exchange the per-mod feature matrices over the WIRE, not the
        # filesystem: round 3 read the other hosts' artifacts from disk
        # after the barrier, silently assuming a shared filesystem (true
        # on GCS-fused pods, a post-barrier FileNotFoundError on plain
        # multi-VM setups — VERDICT r3 item 7). The matrices are small
        # ((num_snr, num_frames, 18) f32 ~ 1.1 MB default), so each owner
        # broadcasts its share and every process persists a local copy of
        # every artifact — downstream stages (train/eval/plot) then work
        # identically on shared and per-host filesystems.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("amcpy_extract_done")
        for mi, mod in enumerate(all_mods):
            owner = mi % nproc
            # broadcast the OWNER's shape first: the single-host path
            # tolerates dataset dims drifting from cfg (extract_batch uses
            # raw.shape), so non-owners must not assume the cfg shape —
            # a mismatched zeros placeholder would fail the payload
            # broadcast after the barrier (ADVICE r4)
            if mod in results:
                src = np.ascontiguousarray(results[mod], dtype=np.float32)
                shape_arr = np.asarray(src.shape, np.int64)
            else:
                src = None
                shape_arr = np.zeros(3, np.int64)
            got_shape = multihost_utils.broadcast_one_to_all(
                shape_arr, is_source=(pidx == owner)
            )
            if src is None:
                src = np.zeros(tuple(int(v) for v in got_shape), np.float32)
            got = multihost_utils.broadcast_one_to_all(
                src, is_source=(pidx == owner)
            )
            if mod not in results:
                results[mod] = np.asarray(got)
                out_path = (
                    cfg.paths.calculated_features / f"{mod}_features.mat"
                )
                if not out_path.exists():  # per-host filesystem
                    io_mat.save_features(cfg, mod, results[mod])
    return results


def run_extraction_synthetic(
    cfg: Config,
    seed: int = 0,
    *,
    logger: MetricsLogger | None = None,
) -> dict[str, np.ndarray]:
    """Fused on-device generate -> extract: frames are synthesized in HBM
    and consumed by the extractor without ever crossing the host boundary
    (only the tiny ``(snr, frames, 18)`` feature matrices come back).

    This is the production data-residency pattern — and on tunneled
    backends it is orders of magnitude faster end-to-end than
    ``generate`` + ``extract`` (no multi-GB raw-IQ round trips). Writes
    the standard per-modulation feature artifacts.
    """
    import jax.numpy as jnp

    from amcpy_tpu.data import synth

    cfg.paths.ensure_dirs()
    if logger is None:
        logger = MetricsLogger(cfg.paths.metrics / "run.jsonl")
    s = cfg.signals
    mesh = make_mesh(cfg)
    kern, _, wants_planes = _kernel_fn(
        mesh,
        cfg.compute.kernel,
        cfg.compute.normalize_scale,
        cfg.compute.gmax_mode,
    )
    results: dict[str, np.ndarray] = {}

    @jax.jit
    def _wgn_planar(key):
        noise = jax.random.normal(
            key, (s.num_snr, s.num_frames, s.frame_size, 2), jnp.float32
        ) / np.sqrt(2.0)
        return noise

    for mi, mod in enumerate(s.modulations_with_noise):
        key = jax.random.key(seed * 1000 + mi)
        with stage_timer(logger, "extract_synthetic", modulation=mod) as rec:
            if mod == "WGN":
                planar = _wgn_planar(key)  # (S, F, N, 2)
            else:
                pts_c = synth._constellation(mod)
                pts = jnp.asarray(
                    np.stack([pts_c.real, pts_c.imag], -1), jnp.float32
                )
                planar = synth._gen_frames(
                    key,
                    pts,
                    jnp.asarray(s.snr_db, jnp.float32),
                    s.num_frames,
                    s.frame_size,
                    int(pts.shape[0]),
                    True,
                )
            # (S, F, N, 2) -> (S, F, 2, N) -> (S*F, 2, N), still on device
            iq = jnp.moveaxis(planar, -1, -2).reshape(
                s.num_snr * s.num_frames, 2, s.frame_size
            )
            feats = np.empty(
                (iq.shape[0], NUM_FEATURES), dtype=np.float32
            )
            # The shard_map-wrapped kernels require the batch to divide
            # evenly over the data axis: round the chunk size to a multiple
            # of the mesh's data-axis device count and pad the final chunk
            # on device (repeating the last frame), trimming after fetch.
            n_data = mesh.devices.size // (
                mesh.shape[mesh.axis_names[-1]]
                if len(mesh.axis_names) > 1 else 1
            )
            chunk = max(256, (1 << 23) // s.frame_size)
            chunk = max(n_data, chunk - chunk % n_data)
            pending = None
            for start in range(0, iq.shape[0], chunk):
                part_in = iq[start : start + chunk]
                orig = part_in.shape[0]
                rem = (-orig) % n_data
                if rem:
                    part_in = jnp.concatenate(
                        [part_in, jnp.repeat(part_in[-1:], rem, axis=0)]
                    )
                if wants_planes:
                    part = kern(part_in[:, 0, :], part_in[:, 1, :])
                else:
                    part = kern(part_in)
                if pending is not None:
                    p_start, p_orig, p_part = pending
                    feats[p_start : p_start + p_orig] = jax.device_get(
                        p_part
                    )[:p_orig]
                pending = (start, orig, part)
            if pending is not None:
                p_start, p_orig, p_part = pending
                feats[p_start : p_start + p_orig] = jax.device_get(
                    p_part
                )[:p_orig]
            rec["frames"] = int(iq.shape[0])
        fps = rec["frames"] / max(rec["wall_s"], 1e-9)
        print(
            f"[{mod}] {rec['frames']} frames in {rec['wall_s']:.2f}s "
            f"({fps:,.0f} frames/s, on-device synthesis)"
        )
        feats = feats.reshape(s.num_snr, s.num_frames, NUM_FEATURES)
        io_mat.save_features(cfg, mod, feats)
        results[mod] = feats
    return results
