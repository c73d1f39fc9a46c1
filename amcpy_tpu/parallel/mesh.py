"""Device mesh construction and sharding helpers.

The reference's parallelism was 6 OS processes x 8 threads on one CPU host
(``/root/reference/src/amcpy/feature_extraction.py:89-97``). Here both
collapse into SPMD over a ``jax.sharding.Mesh``:

* ``data`` axis — shards the global frame batch (modulation x SNR x frame).
  This is the workhorse axis for extraction throughput and data-parallel
  training (gradients ``pmean`` over it).
* ``seq`` axis (optional, size 1 by default) — shards the *sample* axis of
  very long frames. Per-frame reductions (moments, stds, kurtosis)
  decompose into shard-local partial sums + ``psum``; the instantaneous-
  frequency diff needs only a 1-sample halo exchange (``ppermute``).

Multi-host: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``); the same mesh code then spans all hosts,
with XLA lowering collectives to ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from amcpy_tpu.config import Config

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
    "put_global",
    "is_primary",
    "init_distributed",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX; returns True if it initialized.

    Resolution order per argument: explicit value > ``AMCPY_*`` env
    (``AMCPY_COORDINATOR``, ``AMCPY_NUM_PROCESSES``, ``AMCPY_PROCESS_ID``)
    > ``jax.distributed.initialize`` auto-detection (TPU pods, Slurm, GKE
    populate the standard envs so a bare initialize works there).
    No-op when nothing indicates a multi-process run.
    """
    if jax.distributed.is_initialized():
        return True  # already initialized
    if coordinator_address is None:
        coordinator_address = os.environ.get("AMCPY_COORDINATOR")
    if num_processes is None and os.environ.get("AMCPY_NUM_PROCESSES"):
        num_processes = int(os.environ["AMCPY_NUM_PROCESSES"])
    if process_id is None and os.environ.get("AMCPY_PROCESS_ID"):
        process_id = int(os.environ["AMCPY_PROCESS_ID"])
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(
    cfg: Config | None = None,
    *,
    shape: Sequence[int] | None = None,
    axis_names: Sequence[str] | None = None,
) -> Mesh:
    """Build the device mesh.

    Default: all visible devices on the ``data`` axis and a trivial
    ``seq`` axis of 1. ``cfg.compute.mesh_shape`` or ``shape`` overrides,
    e.g. ``(4, 2)`` for 4-way data x 2-way sequence sharding.
    """
    data_axis = cfg.compute.data_axis if cfg else "data"
    seq_axis = cfg.compute.seq_axis if cfg else "seq"
    if axis_names is None:
        axis_names = (data_axis, seq_axis)
    if shape is None:
        shape = tuple(cfg.compute.mesh_shape) if cfg else ()
    n_dev = len(jax.devices())
    if not shape:
        shape = (n_dev,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n_dev:
        raise ValueError(
            f"mesh shape {tuple(shape)} does not cover {n_dev} devices"
        )
    return jax.make_mesh(tuple(shape), tuple(axis_names))


def batch_sharding(
    mesh: Mesh, *, seq_sharded: bool = False, ndim: int = 2
) -> NamedSharding:
    """Sharding for a frame batch: leading (batch) dim over ``data`` and,
    optionally, the trailing (sample) dim over ``seq``. Works for both
    ``(B, N)`` complex and ``(B, 2, N)`` planar layouts via ``ndim``."""
    data_axis, seq_axis = mesh.axis_names[0], mesh.axis_names[-1]
    if seq_sharded:
        spec = PartitionSpec(data_axis, *([None] * (ndim - 2)), seq_axis)
    else:
        spec = PartitionSpec(data_axis)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def is_primary() -> bool:
    """True on the process that owns shared filesystem artifacts (figures,
    checkpoints, .mat exports) in a multi-process run."""
    return jax.process_index() == 0


#: Host->device staging chunk: tunneled PJRT backends move many ~64 MB
#: transfers far more reliably than one multi-hundred-MB transfer (large
#: single RPCs have been observed to stall the relay for minutes).
_STAGE_CHUNK_BYTES = 64 << 20


def put_global(x, sharding: NamedSharding) -> jax.Array:
    """Place a host array as a global sharded array — multi-process safe.

    ``jax.device_put`` rejects shardings that span non-addressable devices;
    ``make_array_from_callback`` instead asks each process only for its own
    addressable shards. Correct whenever every process holds the SAME host
    array (our pipeline guarantees this: every process reads identical
    feature artifacts), and identical to ``device_put`` single-process.

    Single-process arrays larger than ``_STAGE_CHUNK_BYTES`` are staged in
    bounded row chunks and concatenated on device (bit-identical result).
    """
    x = np.asarray(x)
    if (
        jax.process_count() == 1
        and x.ndim >= 1
        and x.shape[0] > 1
        and x.nbytes > _STAGE_CHUNK_BYTES
    ):
        import jax.numpy as jnp

        row_bytes = max(1, x.nbytes // x.shape[0])
        rows = max(1, _STAGE_CHUNK_BYTES // row_bytes)
        parts = [
            jax.device_put(x[i : i + rows])
            for i in range(0, x.shape[0], rows)
        ]
        return jax.device_put(jnp.concatenate(parts, axis=0), sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (repeating the last row so the
    padding is numerically benign); returns (padded, original_size)."""
    b = batch.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch, b
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), b


def shard_batch(
    batch: np.ndarray, mesh: Mesh, *, seq_sharded: bool = False
) -> tuple[jax.Array, int]:
    """Pad + device_put a host batch with the canonical sharding.

    Returns the sharded device array and the original (unpadded) size.
    """
    n_data = mesh.shape[mesh.axis_names[0]]
    padded, orig = pad_to_multiple(np.asarray(batch), n_data)
    arr = jax.device_put(
        padded,
        batch_sharding(mesh, seq_sharded=seq_sharded, ndim=padded.ndim),
    )
    return arr, orig
