"""Conformance tests for the fused Pallas kernel (interpret mode on CPU;
the compiled path is exercised on real TPU by bench.py / verify runs)."""

import numpy as np
import pytest

from amcpy_tpu.ops.features import to_planar
from amcpy_tpu.ops.pallas_features import extract_features_pallas

from .oracle import features_batch, term_scales


def _frames(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)


@pytest.mark.parametrize("normalize", [True, False])
def test_pallas_matches_oracle(normalize):
    frames = _frames(8, 256)
    got = np.asarray(
        extract_features_pallas(
            to_planar(frames),
            normalize_scale=normalize,
            tile_b=8,
            interpret=True,
        )
    )
    want = features_batch(frames)
    for bi in range(8):
        tol = 1e-4 * term_scales(frames[bi]) + 1e-5 * np.abs(want[bi])
        bad = np.abs(got[bi] - want[bi]) > tol
        assert not bad.any(), (
            f"frame {bi} features {np.nonzero(bad)[0] + 1}: "
            f"got {got[bi][bad]} want {want[bi][bad]}"
        )


def test_pallas_padding_path():
    frames = _frames(5, 128, seed=1)  # 5 not a multiple of tile_b=4
    got = np.asarray(
        extract_features_pallas(to_planar(frames), tile_b=4, interpret=True)
    )
    assert got.shape == (5, 18)
    want = features_batch(frames)
    for bi in range(5):
        tol = 1e-4 * term_scales(frames[bi]) + 1e-5 * np.abs(want[bi])
        assert (np.abs(got[bi] - want[bi]) <= tol).all()


def test_pallas_matches_xla_path():
    from amcpy_tpu.ops.features import extract_features_planar

    frames = _frames(4, 512, seed=2)
    iq = to_planar(frames)
    a = np.asarray(extract_features_pallas(iq, tile_b=4, interpret=True))
    b = np.asarray(extract_features_planar(iq))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
