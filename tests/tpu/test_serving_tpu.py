"""Serving-path conformance on real TPU hardware.

The CPU suite drives serving with interpret-mode kernels; this locks the
COMPILED routing on the chip: `kernel="auto"` resolves to the fused
Mosaic extraction kernel for the MLP pipeline and to the fused Pallas
CNN trunk for CNN checkpoints, end-to-end from a checkpoint through
``AMCPipeline``. Skipped off-TPU; run via
``AMCPY_TEST_TPU=1 python -m pytest tests/tpu -q``.
"""

import numpy as np
import pytest

import jax

from amcpy_tpu.extraction import backend_is_tpu

pytestmark = pytest.mark.skipif(
    not backend_is_tpu(),
    reason="compiled serving tests need a real TPU backend",
)


@pytest.fixture(scope="module")
def tpu_project(tmp_path_factory):
    from amcpy_tpu.config import Config
    from amcpy_tpu.data import synth
    from amcpy_tpu.extraction import run_extraction
    from amcpy_tpu.preprocessing import preprocess
    from amcpy_tpu.train import save_checkpoint, train

    root = tmp_path_factory.mktemp("tpu_serve")
    cfg = Config().replace(
        paths={"root": str(root)},
        signals={"frame_size": 256, "num_frames": 20},
        training={"epochs": 6, "batch_size": 64},
    )
    synth.write_dataset(cfg, seed=9)
    features = run_extraction(cfg)
    x_tr, x_te, y_tr, y_te, scaler = preprocess(features, cfg)
    model, state, hist, model_id = train(cfg, x_tr, y_tr, x_te, y_te)
    save_checkpoint(cfg, model_id, state, scaler, hist, cfg.training.epochs)
    return cfg, model_id


def test_compiled_serving_pipeline_mlp(tpu_project):
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.serve import AMCPipeline

    cfg, model_id = tpu_project
    pipe = AMCPipeline.from_checkpoint(cfg, model_id)
    assert pipe._kernel == "fused" and not pipe._interpret
    raw = io_mat.load_modulation(cfg, "BPSK")[-2:].reshape(-1, 256)
    preds = pipe.predict(raw)
    assert preds.shape == (40,)
    assert (preds == 0).mean() > 0.5  # high-SNR BPSK mostly recognized


def test_compiled_serving_cnn_trunk(tpu_project):
    """CNN checkpoints route through the compiled fused Pallas trunk."""
    import jax.numpy as jnp

    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.ops.cnn_infer import cnn_logits_fused
    from amcpy_tpu.serve import _pipeline_logits

    cfg, _ = tpu_project
    model = IQConvNet(n_classes=6)
    rng = np.random.default_rng(2)
    iq = jnp.asarray(
        rng.standard_normal((16, 2, 256)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), iq[:1], train=False)
    via_pipeline = np.asarray(
        _pipeline_logits(
            model, iq, variables["params"], variables["batch_stats"],
            jnp.arange(6), jnp.zeros(6), jnp.ones(6),
            kernel="fused", gmax_mode="matmul", interpret=False,
        )
    )
    direct = np.asarray(cnn_logits_fused(model, variables, iq))
    np.testing.assert_allclose(via_pipeline, direct, atol=1e-5)
    flax = np.asarray(model.apply(variables, iq, train=False))
    assert (via_pipeline.argmax(-1) == flax.argmax(-1)).all()


def test_compiled_serving_wire_path(tpu_project):
    """Large feature-path batches ride the COMPILED int24 wire program on
    the chip; labels must agree with the f32 pipeline."""
    import numpy as np

    from amcpy_tpu.data import io_mat
    from amcpy_tpu.serve import AMCPipeline

    cfg, model_id = tpu_project
    wire_pipe = AMCPipeline.from_checkpoint(
        cfg.replace(compute={"wire_format": "int24"}), model_id
    )
    f32_pipe = AMCPipeline.from_checkpoint(
        cfg.replace(compute={"wire_format": "f32"}), model_id
    )
    # pin to one device: the multi-device fan-out would split 512 frames
    # below WIRE_MIN_BATCH per chunk and silently test f32-vs-f32
    # (review r5 pass 2)
    wire_pipe.multi_device = f32_pipe.multi_device = False
    assert wire_pipe._wire == "int24" and wire_pipe._kernel == "fused"
    raw = io_mat.load_modulation(cfg, "QPSK").reshape(-1, 256)
    frames = np.tile(raw, (2, 1))[:512]  # >= WIRE_MIN_BATCH
    assert wire_pipe._wire_eligible(512, 256)
    pw = wire_pipe.predict(frames)
    pf = f32_pipe.predict(frames)
    assert pw.shape == (512,)
    assert (pw == pf).mean() > 0.99
