"""Compiled-Mosaic conformance on real TPU hardware (VERDICT r2 item 5).

The main suite runs Pallas kernels in interpret mode on the CPU mesh; a
Mosaic lowering regression would ship with a green suite. This module
executes the COMPILED kernels on the chip and checks them against the
float64 oracle and the XLA path. It is skipped automatically unless the
default backend is a TPU; run it with:

    AMCPY_TEST_TPU=1 python -m pytest tests/tpu/ -q

(the env var stops tests/conftest.py from forcing the CPU backend —
this is what the verify recipe runs wherever a TPU exists).
"""

import numpy as np
import pytest

import jax

from ..oracle import features_batch, term_scales
from ..test_features import GOLDEN, _golden_signal

from amcpy_tpu.extraction import backend_is_tpu

pytestmark = pytest.mark.skipif(
    not backend_is_tpu(),
    reason="compiled-Mosaic tests need a real TPU backend",
)


def _rand_frames(b, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    x *= np.exp(rng.uniform(-3, 3, (b, 1)))
    return x


def _tolerances(x, want):
    # the f1 column additionally absorbs the bf16 MXU DFT error, which the
    # PARITY tolerance model covers via its Parseval term scale
    scales = np.stack([term_scales(f) for f in x])
    return 2e-4 * scales + 2e-5 * np.abs(want)


@pytest.mark.parametrize("n", [256, 2048])
def test_compiled_fused_kernel_matches_oracle(n):
    from amcpy_tpu.ops.fused import extract_features_fused, split_planes

    x = _rand_frames(64, n, seed=1)
    i, q = split_planes(x)
    got = np.asarray(extract_features_fused(i, q))  # compiled Mosaic
    want = features_batch(x)
    tol = _tolerances(x, want)
    bad = np.abs(got - want) > tol
    assert not bad.any(), (
        f"{bad.sum()} violations at N={n}; worst feature "
        f"{int(np.argwhere(bad)[0][1]) + 1}"
    )


@pytest.mark.parametrize("n", [256, 2048])
def test_compiled_pallas_kernel_matches_xla(n):
    from amcpy_tpu.ops.features import extract_features_planar, to_planar
    from amcpy_tpu.ops.pallas_features import extract_features_pallas

    x = _rand_frames(64, n, seed=2)
    iq = jax.numpy.asarray(to_planar(x))
    got = np.asarray(extract_features_pallas(iq))  # compiled Mosaic
    want = np.asarray(extract_features_planar(iq))
    tol = _tolerances(x, want)
    bad = np.abs(got - want) > tol
    assert not bad.any(), f"{bad.sum()} violations at N={n}"


def test_compiled_fused_golden_fallback():
    """The 10-sample golden signal routes through the XLA fallback on any
    backend — pin it on TPU too."""
    from amcpy_tpu.extraction import extract_batch
    from amcpy_tpu.parallel.mesh import make_mesh

    sig = _golden_signal().astype(np.complex64)[None, :]
    got = extract_batch(sig, mesh=make_mesh(), kernel="fused")
    np.testing.assert_allclose(got[0], GOLDEN, rtol=2e-5)


def test_compiled_cnn_fused_trunk_matches_apply():
    """The fused CNN inference trunk (ops/cnn_infer.py), COMPILED on the
    chip, must agree with the flax forward: identical argmax, logits
    within bf16 accumulation-order tolerance."""
    import jax.numpy as jnp

    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.ops.cnn_infer import cnn_logits_fused

    model = IQConvNet(n_classes=6)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((64, 2, 2048)).astype(np.float32) * 2.3
    )
    variables = model.init(jax.random.key(0), x[:1], train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(cnn_logits_fused(model, variables, x))
    assert (got.argmax(-1) == ref.argmax(-1)).all()
    np.testing.assert_allclose(got, ref, atol=0.08)
