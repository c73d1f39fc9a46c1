"""Head-to-head parity against the ACTUAL reference implementation.

When the reference checkout is present (read-only at /root/reference), run
its per-frame feature functions (``src/amcpy/features.py:214-232``) on the
same frames as our fused extractor and compare within the float32-vs-
float64 error budget. This is the strongest parity artifact available —
not an oracle re-derivation, the reference's own code. Skipped cleanly
when the reference tree is absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from amcpy_tpu.ops.features import extract_features

from .oracle import term_scales

_REF = Path("/root/reference/src")


@pytest.fixture(scope="module")
def reference_calculate():
    if not (_REF / "amcpy" / "features.py").exists():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(_REF))
    try:
        from amcpy.features import calculate_features
    except ImportError:
        pytest.skip("reference package not importable")
    yield calculate_features
    sys.path.remove(str(_REF))


@pytest.mark.parametrize("kind", ["qpsk", "qam16", "wgn"])
def test_against_reference_implementation(reference_calculate, kind):
    rng = np.random.default_rng(abs(hash(kind)) % 2**32)
    n = 512
    if kind == "wgn":
        frames = (
            rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        ) / np.sqrt(2)
    elif kind == "qpsk":
        c = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
        frames = c[rng.integers(0, 4, (3, n))] + 0.1 * (
            rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        )
    else:
        lv = np.array([-3.0, -1.0, 1.0, 3.0]) / np.sqrt(10)
        frames = (
            lv[rng.integers(0, 4, (3, n))]
            + 1j * lv[rng.integers(0, 4, (3, n))]
            + 0.05 * (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n)))
        )

    ours = np.asarray(extract_features(frames.astype(np.complex64)))
    for bi in range(frames.shape[0]):
        want = np.asarray(
            reference_calculate(list(range(1, 19)), frames[bi])
        )
        tol = 2e-4 * term_scales(frames[bi]) + 2e-5 * np.abs(want)
        err = np.abs(ours[bi] - want)
        bad = err > tol
        assert not bad.any(), (
            f"{kind} frame {bi}: features {np.nonzero(bad)[0] + 1} "
            f"ours={ours[bi][bad]} reference={want[bad]}"
        )
