"""Hyperparameter sweeps — native replacement for the reference's W&B setup.

The reference shipped a W&B Bayesian sweep spec (``/root/reference/
sweep.yaml:1-47``: batch {32..196}, dropout {0.2,0.3,0.4}, epochs 5-30,
hidden sizes 6-30, lr 5e-4..2e-3, rmsprop) plus a frozen best-run artifact
(``config.yaml``) — but wandb was never imported by the v2 code (SURVEY.md
sec 5). Here sweeps are first-class and dependency-free:

* :func:`load_sweep_spec` parses the same W&B sweep-YAML schema
  (``values`` lists, ``int_uniform``/``uniform`` ranges, ``categorical``).
* :func:`run_sweep` does deterministic random search over the spec,
  training each trial with the standard training stack, logging every
  trial to ``metrics/sweep.jsonl``, and returning the best config —
  which can be written back as a YAML usable with ``amc --config``.
* If wandb happens to be installed, trials are mirrored to it (optional,
  never required).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from amcpy_tpu.config import Config

__all__ = ["load_sweep_spec", "sample_params", "run_sweep", "DEFAULT_SPEC"]

#: The reference sweep space (sweep.yaml:5-44) in parsed form.
DEFAULT_SPEC: dict[str, dict[str, Any]] = {
    "activation": {"values": ["relu"]},
    "batch_size": {"values": [32, 64, 96, 128, 160, 196]},
    "dropout": {"values": [0.2, 0.3, 0.4]},
    "epochs": {"distribution": "int_uniform", "min": 5, "max": 30},
    "layer_size_hl1": {"distribution": "int_uniform", "min": 6, "max": 30},
    "layer_size_hl2": {"distribution": "int_uniform", "min": 6, "max": 30},
    "layer_size_hl3": {"distribution": "int_uniform", "min": 6, "max": 30},
    "learning_rate": {"distribution": "uniform", "min": 0.0005, "max": 0.002},
    "optimizer": {"values": ["rmsprop"]},
}


def load_sweep_spec(path: str | Path) -> dict[str, dict[str, Any]]:
    """Parse a W&B-format sweep YAML into a parameter spec dict."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    return dict(raw.get("parameters", raw))


def sample_params(
    spec: Mapping[str, Mapping[str, Any]], rng: np.random.Generator
) -> dict[str, Any]:
    """Draw one configuration from the spec."""
    out: dict[str, Any] = {}
    for name, p in spec.items():
        if "values" in p:
            vals = list(p["values"])
            out[name] = vals[int(rng.integers(0, len(vals)))]
        elif p.get("distribution") == "int_uniform":
            out[name] = int(rng.integers(int(p["min"]), int(p["max"]) + 1))
        elif p.get("distribution") in ("uniform", None):
            out[name] = float(rng.uniform(float(p["min"]), float(p["max"])))
        elif p.get("distribution") in ("log_uniform", "log_uniform_values"):
            lo, hi = np.log(float(p["min"])), np.log(float(p["max"]))
            out[name] = float(np.exp(rng.uniform(lo, hi)))
        else:
            raise ValueError(f"unsupported distribution for {name}: {p}")
    return out


def _apply_params(cfg: Config, params: Mapping[str, Any]) -> Config:
    """Map sweep-parameter names (reference naming) onto the config tree."""
    t: dict[str, Any] = {}
    hidden = list(cfg.training.hidden_sizes)
    for k, v in params.items():
        if k == "layer_size_hl1":
            hidden[0] = int(v)
        elif k == "layer_size_hl2":
            hidden[1] = int(v)
        elif k == "layer_size_hl3":
            hidden[2] = int(v)
        elif k in (
            "activation", "batch_size", "dropout", "epochs",
            "learning_rate", "optimizer",
        ):
            t[k] = v
    t["hidden_sizes"] = tuple(hidden)
    return cfg.replace(training=t)


def run_sweep(
    cfg: Config,
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_test: np.ndarray,
    y_test: np.ndarray,
    *,
    spec: Mapping[str, Mapping[str, Any]] | None = None,
    n_trials: int = 20,
    seed: int = 0,
    metric: str = "val_accuracy",
    log_path: str | Path | None = None,
) -> tuple[dict[str, Any], list[dict[str, Any]]]:
    """Random-search sweep. Returns (best_trial, all_trials).

    Each trial record: ``{"trial", "params", "metric", "history_last",
    "wall_s"}``. Trials are logged as JSONL as they complete, so an
    interrupted sweep keeps its finished work.
    """
    from amcpy_tpu.train.training import train

    spec = dict(spec or DEFAULT_SPEC)
    rng = np.random.default_rng(seed)
    log_file = Path(log_path) if log_path else cfg.paths.metrics / "sweep.jsonl"
    log_file.parent.mkdir(parents=True, exist_ok=True)

    try:
        import wandb  # noqa: F401 — optional mirror only

        have_wandb = True
    except ImportError:
        have_wandb = False

    trials: list[dict[str, Any]] = []
    best: dict[str, Any] | None = None
    for trial_idx in range(n_trials):
        params = sample_params(spec, rng)
        trial_cfg = _apply_params(cfg, params)
        t0 = time.perf_counter()
        _, _, history, model_id = train(
            trial_cfg, x_train, y_train, x_test, y_test, seed=seed + trial_idx
        )
        record = {
            "trial": trial_idx,
            "model_id": model_id,
            "params": params,
            "metric": float(history[metric][-1]),
            "history_last": {k: float(v[-1]) for k, v in history.items()},
            "wall_s": time.perf_counter() - t0,
        }
        with open(log_file, "a") as f:
            f.write(json.dumps(record) + "\n")
        if have_wandb:
            try:
                import wandb

                run = wandb.init(
                    project="amcpy-tpu-sweep", config=params, reinit=True
                )
                run.log({metric: record["metric"]})
                run.finish()
            except Exception:
                pass
        trials.append(record)
        if best is None or record["metric"] > best["metric"]:
            best = record
        print(
            f"[sweep {trial_idx + 1}/{n_trials}] {metric}="
            f"{record['metric']:.4f} best={best['metric']:.4f} {params}"
        )
    assert best is not None
    return best, trials
