"""Quantization parity vs the ACTUAL reference quantizer.

Builds a torch copy of a flax classifier (same weights), runs the
reference's ``quantize()`` (``/root/reference/src/amcpy/
nn_quantization.py:57-146``) and ours in reference-parity mode
(``range_mode="reference"``, no BN folding) on the same sample inputs, and
compares the exported int16 ``w_and_b.mat`` payloads element-wise.
Skipped when the reference checkout or torch is unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amcpy_tpu.config import Config
from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.ops.quantize import dense_layers, quantize_model

_REF = Path("/root/reference/src")


@pytest.fixture(scope="module")
def reference_quantize(tmp_path_factory):
    if not (_REF / "amcpy" / "nn_quantization.py").exists():
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(_REF))
    try:
        from amcpy.config import Config as RefConfig, Paths as RefPaths
        from amcpy.nn_quantization import quantize as ref_quantize
    except ImportError:
        pytest.skip("reference package not importable")
    root = tmp_path_factory.mktemp("refq")
    ref_cfg = RefConfig(paths=RefPaths(root=root))
    ref_cfg.paths.ensure_dirs()
    yield torch, ref_quantize, ref_cfg
    sys.path.remove(str(_REF))


def test_quantize_matches_reference(reference_quantize, tmp_path):
    torch, ref_quantize, ref_cfg = reference_quantize

    model = AMCClassifier(n_classes=6, hidden_sizes=(26, 29, 30))
    variables = model.init(
        jax.random.key(3), jnp.zeros((1, 6), jnp.float32), train=False
    )
    params = variables["params"]

    # torch twin: torch Linear stores (out, in) = flax kernel transposed
    layers = dense_layers(params)
    modules = []
    for k, b in layers:
        lin = torch.nn.Linear(k.shape[0], k.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.ascontiguousarray(k.T)))
            lin.bias.copy_(torch.from_numpy(np.ascontiguousarray(b)))
        # the reference's error-logging calls .numpy() on the raw Parameter
        # (nn_quantization.py:127), which torch forbids on grad tensors —
        # itself a latent reference defect; disable grad so its code runs
        lin.weight.requires_grad_(False)
        lin.bias.requires_grad_(False)
        modules.append(lin)
    torch_model = torch.nn.Sequential(*modules)

    rng = np.random.default_rng(4)
    sample = rng.uniform(-3, 3, size=(64, 6)).astype(np.float32)

    ref_save, ref_info = ref_quantize(torch_model, sample, ref_cfg)

    cfg = Config().replace(paths={"root": str(tmp_path)})
    ours_save, ours_info = quantize_model(
        params,
        variables["batch_stats"],
        sample,
        cfg,
        range_mode="reference",
        fold_bn=False,
    )

    np.testing.assert_array_equal(
        ours_save["weights"], np.asarray(ref_save["weights"]).ravel()
    )
    np.testing.assert_array_equal(
        ours_save["biases"], np.asarray(ref_save["biases"]).ravel()
    )
    for key, fmt in ref_info.items():
        assert ours_info[key] == fmt, (key, ours_info[key], fmt)
