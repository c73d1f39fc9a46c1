"""Raw-IQ CNN model family: forward contract, DP training, checkpoint
round-trip, and the CLI path (`amc train --model cnn` -> eval).

The reference has no raw-IQ model (its DeepSig tooling stops at dataset
slicing, ``/root/reference/old/dataset.py:8-65``); these tests pin the new
family's behaviour on the virtual 8-device CPU mesh."""

import json

import numpy as np
import pytest

from amcpy_tpu.cli import main
from amcpy_tpu.config import Config
from amcpy_tpu.data.synth import generate_dataset as _generate_dataset
from amcpy_tpu.models.cnn import IQConvNet
from amcpy_tpu.preprocessing import preprocess_raw


def _tiny_cfg(root=None, frame_size=128, num_frames=24, epochs=5):
    kw = {"paths": {"root": str(root)}} if root else {}
    return Config().replace(
        signals={"frame_size": frame_size, "num_frames": num_frames},
        training={"epochs": epochs, "batch_size": 64},
        **kw,
    )


def generate_dataset(cfg, seed=0):
    """Synth data re-keyed by modulation name (the load_dataset contract)."""
    raw = _generate_dataset(cfg, seed)
    return {
        m: raw[cfg.signals.mat_info[m]]
        for m in cfg.signals.modulations_with_noise
    }


def _small_cnn(n_classes=6, dtype="float32"):
    # shallow stack so 128-sample test frames keep a useful time axis
    return IQConvNet(
        n_classes=n_classes,
        channels=(16, 32),
        kernel_sizes=(5, 3),
        strides=(2, 2),
        dense=32,
        dtype=dtype,
    )


def test_forward_contract():
    import jax
    import jax.numpy as jnp

    model = _small_cnn()
    x = np.random.default_rng(0).standard_normal((4, 2, 128)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    logits = model.apply(variables, jnp.asarray(x), train=False)
    assert logits.shape == (4, 6)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))
    # per-frame RMS normalization => scale invariance of the forward pass
    scaled = model.apply(variables, jnp.asarray(x) * 37.5, train=False)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(scaled), rtol=1e-4, atol=1e-5
    )


def test_train_cnn_learns_on_synthetic():
    from amcpy_tpu.train import train

    cfg = _tiny_cfg()
    data = generate_dataset(cfg, seed=3)
    x_train, x_test, y_train, y_test = preprocess_raw(data, cfg)
    assert x_train.shape[1:] == (2, 128)
    model, state, history, _ = train(
        cfg, x_train, y_train, x_test, y_test, model=_small_cnn()
    )
    assert history["loss"][-1] < history["loss"][0]
    # high-SNR synthetic frames are separable well above chance
    assert history["val_accuracy"][-1] > 1.0 / 6.0


def test_cnn_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from amcpy_tpu.preprocessing import Standardizer
    from amcpy_tpu.train import load_checkpoint, save_checkpoint, train
    from amcpy_tpu.train.training import predict_logits

    cfg = _tiny_cfg(tmp_path, epochs=2)
    data = generate_dataset(cfg, seed=1)
    x_train, x_test, y_train, y_test = preprocess_raw(data, cfg)
    model = _small_cnn()
    model, state, history, model_id = train(
        cfg, x_train, y_train, x_test, y_test, model=model
    )
    scaler = Standardizer(np.zeros(1, np.float32), np.ones(1, np.float32))
    save_checkpoint(
        cfg, model_id, state, scaler, history, 2,
        model_meta={
            "family": "cnn",
            "input_shape": [2, cfg.signals.frame_size],
            "arch": {
                "channels": list(model.channels),
                "kernel_sizes": list(model.kernel_sizes),
                "strides": list(model.strides),
                "dense": model.dense,
                "dropout": model.dropout,
                "dtype": model.dtype,
            },
        },
    )
    model2, state2, _, meta = load_checkpoint(cfg, model_id)
    assert meta["config"]["model"]["family"] == "cnn"
    assert isinstance(model2, IQConvNet)
    want = predict_logits(model, state.params, state.batch_stats,
                          jnp.asarray(x_test[:16]))
    got = predict_logits(model2, state2.params, state2.batch_stats,
                         jnp.asarray(x_test[:16]))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.fixture(scope="module")
def cnn_root(tmp_path_factory):
    return tmp_path_factory.mktemp("amc_cnn")


def test_cli_cnn_pipeline(cnn_root):
    root = cnn_root
    main(["--root", str(root), "generate", "--seed", "11",
          "--frames", "24", "--frame-size", "128"])
    cfg_yaml = root / "cfg.yaml"
    cfg_yaml.write_text(
        "signals:\n  num_frames: 24\n  frame_size: 128\n"
        "training:\n  epochs: 4\n  batch_size: 64\n"
    )
    main(["--root", str(root), "--config", str(cfg_yaml), "train",
          "--model", "cnn", "--seed", "0"])
    ckpts = list((root / "ann").glob("model-*.msgpack"))
    assert len(ckpts) == 1
    model_id = ckpts[0].stem.replace("model-", "")
    meta = json.loads((root / "ann" / f"model-{model_id}.json").read_text())
    assert meta["config"]["model"]["family"] == "cnn"
    assert meta["config"]["model"]["input_shape"] == [2, 128]
    assert len(meta["history"]["loss"]) == 4
    for art in (f"cm-{model_id}.png", f"accuracy-{model_id}.png",
                f"history-{model_id}.png", f"{model_id}_figure_data.mat"):
        assert (root / "figures" / art).exists()

    # eval resolves the family from the checkpoint, no flag needed
    main(["--root", str(root), "--config", str(cfg_yaml), "eval", model_id])

    import scipy.io

    acc = scipy.io.loadmat(
        str(root / "figures" / f"{model_id}_figure_data.mat")
    )["acc"]
    assert acc.shape == (6, 16)
    # the per-sample default stack must beat chance on high-SNR frames
    # even in this tiny config (see models/cnn.py docstring)
    assert acc[:, -4:].mean() > 1.0 / 6.0

    # the Q-format MCU export path is MLP-only and must say so
    with pytest.raises(SystemExit, match="raw-IQ CNN"):
        main(["--root", str(root), "--config", str(cfg_yaml),
              "quantize", model_id])


def test_cnn_serving_pipeline(cnn_root):
    """AMCPipeline serves CNN checkpoints: raw planar frames straight into
    the model, no feature/standardize stage (runs after the CLI test so the
    newest checkpoint in the module root is the CNN)."""
    from amcpy_tpu.data import io_mat
    from amcpy_tpu.serve import AMCPipeline

    cfg = Config().replace(
        paths={"root": str(cnn_root)},
        signals={"frame_size": 128, "num_frames": 24},
    )
    pipe = AMCPipeline.from_checkpoint(cfg)
    raw = io_mat.load_modulation(cfg, "BPSK")[-2:].reshape(-1, 128)
    preds = pipe.predict(raw)
    assert preds.shape == (48,)
    assert set(np.unique(preds)) <= set(range(6))
    probs = pipe.predict_proba(raw[:4])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # complex and planar inputs agree bitwise
    from amcpy_tpu.ops.features import to_planar

    np.testing.assert_array_equal(
        pipe.predict(raw[:8]), pipe.predict(to_planar(raw[:8]))
    )


def test_cnn_fused_trunk_matches_apply_interpret():
    """ops/cnn_infer.py (BN-folded one-VMEM-pass inference trunk) vs the
    flax forward, interpret mode: identical argmax, logits within bf16
    accumulation-order tolerance; ragged batches pad internally."""
    import jax
    import jax.numpy as jnp

    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.ops.cnn_infer import (
        cnn_logits_fused,
        fold_bn_params,
        supports_fused,
    )

    model = IQConvNet(n_classes=6)
    assert supports_fused(model)
    assert not supports_fused(IQConvNet(n_classes=6, kernel_sizes=(8, 1, 1)))
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((13, 2, 256)).astype(np.float32) * 4.0
    )
    variables = model.init(jax.random.key(1), x[:1], train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(
        cnn_logits_fused(model, variables, x, interpret=True)
    )
    assert got.shape == ref.shape == (13, 6)
    assert (got.argmax(-1) == ref.argmax(-1)).all()
    np.testing.assert_allclose(got, ref, atol=0.08)

    # BN folding is the exact inference identity: folded conv output ==
    # BN(conv(x)) in f32
    folded = fold_bn_params(model, variables)
    w_t, b = folded["convs"][0]
    xin = np.asarray(x[0, :, :8], np.float32)  # (2, 8) channel-major
    manual = np.asarray(w_t) @ xin + np.asarray(b)
    p, s = variables["params"], variables["batch_stats"]
    conv_w = np.asarray(p["Conv_0"]["kernel"], np.float32)[0]
    conv_b = np.asarray(p["Conv_0"]["bias"], np.float32)
    y = conv_w.T @ xin + conv_b[:, None]
    bn_y = (
        (y - np.asarray(s["BatchNorm_0"]["mean"], np.float32)[:, None])
        / np.sqrt(np.asarray(s["BatchNorm_0"]["var"], np.float32)[:, None] + 1e-5)
        * np.asarray(p["BatchNorm_0"]["scale"], np.float32)[:, None]
        + np.asarray(p["BatchNorm_0"]["bias"], np.float32)[:, None]
    )
    np.testing.assert_allclose(manual, bn_y, rtol=1e-5, atol=1e-6)


def test_supports_fused_requires_bf16():
    """An f32-dtype checkpoint must keep the flax forward — the fused
    trunk hardwires bf16 multiplies (code-review r4)."""
    from amcpy_tpu.models.cnn import IQConvNet
    from amcpy_tpu.ops.cnn_infer import supports_fused

    assert supports_fused(IQConvNet(n_classes=6))
    assert not supports_fused(IQConvNet(n_classes=6, dtype="float32"))


def test_cnn_augmentation_train_only():
    """Phase-rotation + SNR-mixing augmentation perturbs the TRAIN-mode
    forward (stochastic via the dropout rng) but leaves eval untouched:
    eval logits of the augmented model equal the plain model's under the
    same parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amcpy_tpu.models.cnn import IQConvNet

    kw = dict(
        n_classes=6, channels=(8, 16), kernel_sizes=(1, 1), strides=(1, 1),
        dense=16, dtype="float32",
    )
    plain = IQConvNet(**kw)
    aug = IQConvNet(
        **kw, aug_phase=True, aug_noise_snr_db=(-12.0, 25.0)
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 2, 64)),
        jnp.float32,
    )
    v = plain.init(jax.random.key(0), x, train=False)
    # eval: augmentation flags change nothing
    np.testing.assert_array_equal(
        np.asarray(plain.apply(v, x, train=False)),
        np.asarray(aug.apply(v, x, train=False)),
    )
    # train: augmented forward differs from plain and is rng-dependent
    rng = {"dropout": jax.random.key(1)}
    a1, _ = aug.apply(v, x, train=True, mutable=["batch_stats"], rngs=rng)
    p1, _ = plain.apply(v, x, train=True, mutable=["batch_stats"], rngs=rng)
    assert not np.allclose(np.asarray(a1), np.asarray(p1))
    a2, _ = aug.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2)},
    )
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_cnn_phase_rotation_preserves_magnitude_stats():
    """A pure phase rotation must not change per-frame power, so the
    RMS-normalized augmented input keeps unit power (sanity of the
    rotation algebra)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amcpy_tpu.models.cnn import IQConvNet

    model = IQConvNet(
        n_classes=6, channels=(8,), kernel_sizes=(1,), strides=(1,),
        dense=8, dtype="float32", aug_phase=True,
    )
    rng = np.random.default_rng(1)
    i = rng.standard_normal((8, 64)).astype(np.float32)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    x = jnp.asarray(np.stack([i, q], axis=1))
    # rotate manually with the same algebra the model uses
    th = 1.2345
    c, s = np.cos(th), np.sin(th)
    rot = np.stack([i * c - q * s, i * s + q * c], axis=1)
    np.testing.assert_allclose(
        np.sum(rot**2, axis=(1, 2)),
        np.asarray(jnp.sum(x**2, axis=(1, 2))),
        rtol=1e-5,
    )
