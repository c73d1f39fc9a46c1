"""Sweep subsystem tests: spec parsing, sampling, and a tiny 2-trial run."""

import json

import numpy as np

from amcpy_tpu.config import Config
from amcpy_tpu.train.sweep import (
    DEFAULT_SPEC,
    load_sweep_spec,
    run_sweep,
    sample_params,
)


def test_sample_params_respects_spec():
    rng = np.random.default_rng(0)
    for _ in range(50):
        p = sample_params(DEFAULT_SPEC, rng)
        assert p["batch_size"] in (32, 64, 96, 128, 160, 196)
        assert p["dropout"] in (0.2, 0.3, 0.4)
        assert 5 <= p["epochs"] <= 30
        assert 6 <= p["layer_size_hl1"] <= 30
        assert 0.0005 <= p["learning_rate"] <= 0.002
        assert p["optimizer"] == "rmsprop"


def test_load_sweep_spec_wandb_format(tmp_path):
    yml = tmp_path / "sweep.yaml"
    yml.write_text(
        "method: bayes\nmetric:\n  goal: maximize\n  name: accuracy\n"
        "parameters:\n"
        "  dropout:\n    values: [0.1, 0.2]\n"
        "  lr:\n    distribution: log_uniform\n    min: 0.0001\n    max: 0.01\n"
    )
    spec = load_sweep_spec(yml)
    assert set(spec) == {"dropout", "lr"}
    rng = np.random.default_rng(1)
    p = sample_params(spec, rng)
    assert p["dropout"] in (0.1, 0.2)
    assert 0.0001 <= p["lr"] <= 0.01


def test_run_sweep_two_trials(tmp_path):
    cfg = Config().replace(
        paths={"root": str(tmp_path)},
        training={"epochs": 2, "batch_size": 32},
    )
    rng = np.random.default_rng(2)
    n = 240
    y = np.repeat(np.arange(6), n // 6).astype(np.int32)
    x = (rng.standard_normal((n, 6)) + 2.0 * y[:, None]).astype(np.float32)
    spec = {
        "epochs": {"values": [2]},
        "batch_size": {"values": [32]},
        "dropout": {"values": [0.2, 0.4]},
        "learning_rate": {"distribution": "uniform", "min": 1e-3, "max": 2e-3},
        "optimizer": {"values": ["adam"]},
        "layer_size_hl1": {"values": [8]},
        "layer_size_hl2": {"values": [8]},
        "layer_size_hl3": {"values": [8]},
    }
    best, trials = run_sweep(
        cfg, x[:180], y[:180], x[180:], y[180:], spec=spec, n_trials=2, seed=3
    )
    assert len(trials) == 2
    assert best["metric"] == max(t["metric"] for t in trials)
    log = (tmp_path / "metrics" / "sweep.jsonl").read_text().strip().split("\n")
    assert len(log) == 2
    assert json.loads(log[0])["trial"] == 0
