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


def test_run_sweep_parallel_matches_sequential(tmp_path):
    """Device-parallel rounds (trials dispatched concurrently, one device
    each) must produce the IDENTICAL result set as the sequential sweep
    for method='random' and the same seed (VERDICT r2 item 7)."""
    import time as _time

    cfg = Config().replace(
        paths={"root": str(tmp_path)},
        training={"epochs": 2, "batch_size": 32},
    )
    rng = np.random.default_rng(4)
    n = 240
    y = np.repeat(np.arange(6), n // 6).astype(np.int32)
    x = (rng.standard_normal((n, 6)) + 2.0 * y[:, None]).astype(np.float32)
    spec = {
        "epochs": {"values": [2]},
        "batch_size": {"values": [32]},
        "dropout": {"values": [0.2, 0.4]},
        "learning_rate": {"distribution": "uniform", "min": 1e-3, "max": 2e-3},
        "optimizer": {"values": ["adam"]},
        "layer_size_hl1": {"distribution": "int_uniform", "min": 6, "max": 12},
        "layer_size_hl2": {"values": [8]},
        "layer_size_hl3": {"values": [8]},
    }
    args = (cfg, x[:180], y[:180], x[180:], y[180:])
    kw = dict(spec=spec, n_trials=4, seed=7, method="random")
    t0 = _time.perf_counter()
    best_seq, seq = run_sweep(
        *args, log_path=tmp_path / "seq.jsonl", parallel=1, **kw
    )
    t_seq = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    best_par, par = run_sweep(
        *args, log_path=tmp_path / "par.jsonl", parallel=4, **kw
    )
    t_par = _time.perf_counter() - t0
    assert [t["params"] for t in par] == [t["params"] for t in seq]
    np.testing.assert_allclose(
        [t["metric"] for t in par], [t["metric"] for t in seq]
    )
    assert best_par["trial"] == best_seq["trial"]
    print(f"sequential {t_seq:.1f}s vs parallel {t_par:.1f}s")


# ---------------------------------------------------------------------------
# TPE ("bayes") method
# ---------------------------------------------------------------------------


def _toy_objective(p):
    """Smooth synthetic objective over the reference sweep space, maximized
    at lr=0.00125, hl1=24, hl2=12, dropout=0.3, epochs=25."""
    return (
        -np.log(p["learning_rate"] / 0.00125) ** 2
        - ((p["layer_size_hl1"] - 24) / 24.0) ** 2
        - ((p["layer_size_hl2"] - 12) / 24.0) ** 2
        - 0.2 * (p["dropout"] - 0.3) ** 2
        - ((p["epochs"] - 25) / 25.0) ** 2
    )


def _optimize(method, seed, n=40):
    from amcpy_tpu.train.sweep import suggest_tpe

    rng = np.random.default_rng(seed)
    hist, best, curve = [], -np.inf, []
    for _ in range(n):
        if method == "bayes":
            p = suggest_tpe(DEFAULT_SPEC, hist, rng)
        else:
            p = sample_params(DEFAULT_SPEC, rng)
        m = _toy_objective(p)
        hist.append({"params": p, "metric": m})
        best = max(best, m)
        curve.append(best)
    return np.asarray(curve)


def test_tpe_respects_spec_domains():
    from amcpy_tpu.train.sweep import suggest_tpe

    rng = np.random.default_rng(2)
    hist = []
    for _ in range(25):
        p = suggest_tpe(DEFAULT_SPEC, hist, rng)
        assert p["batch_size"] in (32, 64, 96, 128, 160, 196)
        assert p["dropout"] in (0.2, 0.3, 0.4)
        assert 5 <= p["epochs"] <= 30 and isinstance(p["epochs"], int)
        assert 6 <= p["layer_size_hl1"] <= 30
        assert 0.0005 <= p["learning_rate"] <= 0.002
        hist.append({"params": p, "metric": _toy_objective(p)})


def test_tpe_deterministic_given_seed():
    a = _optimize("bayes", seed=11)
    b = _optimize("bayes", seed=11)
    np.testing.assert_array_equal(a, b)


def test_tpe_beats_random_search():
    """VERDICT r1 item 7 'done' bar: bayes beats random search on
    trials-to-best, measured as the mean best-so-far over seeds on a
    seeded synthetic objective (both samplers fully deterministic)."""
    seeds = range(8)
    bayes = np.stack([_optimize("bayes", s) for s in seeds])
    rand = np.stack([_optimize("random", s) for s in seeds])
    # better mean best-so-far both mid-search and at the end
    assert bayes[:, 19].mean() > rand[:, 19].mean()
    assert bayes[:, -1].mean() > rand[:, -1].mean()
