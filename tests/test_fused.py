"""Conformance + routing tests for the full-fusion kernel (ops/fused.py).

Interpret mode on the CPU mesh; the compiled Mosaic path is covered by
``tests/tpu/test_mosaic_tpu.py`` on real hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amcpy_tpu.ops.features import extract_features_planar, to_planar
from amcpy_tpu.ops.fused import extract_features_fused, split_planes

from .oracle import features_batch, term_scales


def _rand_frames(b, n, seed=0, scale_spread=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    if scale_spread:
        x *= np.exp(rng.uniform(-6, 6, (b, 1)))
    return x


def test_fused_matches_oracle_interpret():
    x = _rand_frames(16, 1024)
    i, q = split_planes(x)
    got = np.asarray(
        extract_features_fused(i, q, interpret=True, tile_b=8)
    )
    want = features_batch(x)
    scales = np.stack([term_scales(f) for f in x])
    tol = 1e-4 * scales + 1e-5 * np.abs(want)
    bad = np.abs(got - want) > tol
    assert not bad.any(), (
        f"{bad.sum()} violations; worst feature "
        f"{int(np.argwhere(bad)[0][1]) + 1}"
    )


def test_fused_matches_xla_kernel():
    x = _rand_frames(12, 512, seed=3)
    i, q = split_planes(x)
    got = np.asarray(extract_features_fused(i, q, interpret=True, tile_b=8))
    want = np.asarray(extract_features_planar(to_planar(x)))
    scales = np.stack([term_scales(f) for f in x])
    tol = 2e-4 * scales + 2e-5 * np.abs(want)
    np.testing.assert_array_less(np.abs(got - want), tol)


def test_fused_pads_ragged_batch():
    x = _rand_frames(11, 512, seed=4)  # not a tile multiple
    i, q = split_planes(x)
    got = np.asarray(extract_features_fused(i, q, interpret=True, tile_b=8))
    assert got.shape == (11, 18)
    assert np.isfinite(got).all()


def test_fused_rejects_unfactorizable_frame():
    i = np.zeros((4, 10), np.float32)
    with pytest.raises(ValueError, match="factorization"):
        extract_features_fused(i, i, interpret=True)


def test_extraction_routes_fused_kernel(tmp_path):
    """kernel='fused' must route through the fused kernel on the data
    mesh and fall back to XLA for unfactorizable frame sizes."""
    from amcpy_tpu.extraction import _kernel_fn, extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(8, 1))
    kern, seq_sharded, wants_planes = _kernel_fn(mesh, "fused", True, "matmul")
    assert wants_planes and not seq_sharded

    x = _rand_frames(24, 256, seed=5, scale_spread=False)
    got = extract_batch(x, mesh=mesh, kernel="fused")
    want = extract_batch(x, mesh=mesh, kernel="xla")
    scales = np.stack([term_scales(f) for f in x])
    tol = 2e-4 * scales + 2e-5 * np.abs(want)
    np.testing.assert_array_less(np.abs(got - want), tol)

    # unfactorizable frame size: falls back to the XLA kernel
    x10 = _rand_frames(16, 10, seed=6, scale_spread=False)
    got10 = extract_batch(x10, mesh=mesh, kernel="fused")
    want10 = extract_batch(x10, mesh=mesh, kernel="xla")
    np.testing.assert_allclose(got10, want10, rtol=1e-5, atol=1e-6)


def test_fused_golden_vector_via_routing():
    """The reference golden 10-sample signal goes through the fallback
    path (N=10 has no factorization) and must still match."""
    from amcpy_tpu.extraction import extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh

    from .test_features import GOLDEN, _golden_signal

    sig = _golden_signal().astype(np.complex64)[None, :]
    got = extract_batch(sig, mesh=make_mesh(shape=(8, 1)), kernel="fused")
    np.testing.assert_allclose(got[0], GOLDEN, rtol=2e-5)
