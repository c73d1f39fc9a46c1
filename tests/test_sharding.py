"""Mesh/sharding tests on the virtual 8-device CPU backend: mesh shapes,
sequence-sharded extraction parity, and the driver multi-chip dry run."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from amcpy_tpu.config import Config
from amcpy_tpu.ops.features import to_planar
from amcpy_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    shard_batch,
)

from .oracle import features_batch, term_scales


def test_make_mesh_default_covers_all_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["seq"] == 1


def test_make_mesh_custom_shape():
    cfg = Config().replace(compute={"mesh_shape": (4, 2)})
    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 4, "seq": 2}
    with pytest.raises(ValueError):
        make_mesh(shape=(3, 2))


def test_pad_to_multiple():
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded, orig = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and orig == 5
    np.testing.assert_array_equal(padded[5:], np.tile(x[-1], (3, 1)))
    same, orig2 = pad_to_multiple(x, 5)
    assert same.shape == (5, 2) and orig2 == 5


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    x = np.random.default_rng(0).standard_normal((16, 2, 64)).astype(np.float32)
    arr, orig = shard_batch(x, mesh)
    assert orig == 16
    assert arr.sharding == batch_sharding(mesh)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_seq_sharded_extraction_parity(mesh_shape):
    """Frames sharded along the SAMPLE axis (sequence parallelism): the
    shard_map extractor with psum reductions and ppermute halo exchange
    must match the unsharded float64 oracle."""
    from amcpy_tpu.parallel.sp import extract_features_sp

    cfg = Config().replace(compute={"mesh_shape": mesh_shape})
    mesh = make_mesh(cfg)
    rng = np.random.default_rng(1)
    frames = (
        rng.standard_normal((8, 512)) + 1j * rng.standard_normal((8, 512))
    ).astype(np.complex64)
    iq = to_planar(frames)
    sharded = jax.device_put(
        iq, NamedSharding(mesh, P("data", None, "seq"))
    )
    got = np.asarray(extract_features_sp(sharded, mesh))
    want = features_batch(frames)
    for bi in range(8):
        tol = 1e-4 * term_scales(frames[bi]) + 1e-5 * np.abs(want[bi])
        bad = np.abs(got[bi] - want[bi]) > tol
        assert not bad.any(), (
            f"frame {bi} features {np.nonzero(bad)[0]+1}: "
            f"got {got[bi][bad]} want {want[bi][bad]}"
        )


def test_graft_entry_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 6)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("n", [8, 4, 2])
def test_dryrun_multichip(n):
    import __graft_entry__ as g

    g.dryrun_multichip(n)
