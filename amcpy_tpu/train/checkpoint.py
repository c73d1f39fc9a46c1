"""Checkpoint / resume.

The reference saved only ``model_state_dict`` (``nn_model.py:176-184``) —
no optimizer state, no scaler, no mid-training resume. Here a checkpoint is
a complete training snapshot:

* params + batch_stats + optimizer state (full mid-training resume)
* the fitted :class:`~amcpy_tpu.preprocessing.Standardizer` (the reference
  refit it from files at eval time — scaler drift, SURVEY.md sec 3 defect 5)
* config + history + epoch counter

Serialized with flax msgpack into ``ann/model-{id}.msgpack`` plus a
human-readable ``model-{id}.json`` sidecar.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

from amcpy_tpu.config import Config
from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.preprocessing import Standardizer
from amcpy_tpu.train.training import TrainState, make_optimizer

__all__ = ["save_checkpoint", "load_checkpoint", "resolve_model_id"]


def save_checkpoint(
    cfg: Config,
    model_id: str,
    state: TrainState,
    scaler: Standardizer,
    history: dict[str, list[float]] | None = None,
    epoch: int | None = None,
    model_meta: dict[str, Any] | None = None,
) -> Path:
    """Write the full training snapshot.

    ``model_meta`` records the model family for non-default models, e.g.
    ``{"family": "cnn", "input_shape": [2, N], "arch": {...IQConvNet
    fields...}}``; omitted/None means the reference-parity feature MLP.
    """
    cfg.paths.ensure_dirs()
    # replicated state is addressable (and bit-identical) on every
    # process. Process 0 writes first; after the barrier every other
    # process writes its OWN copy if the artifact is not visible locally —
    # so checkpoints work on shared filesystems (one write, no races) AND
    # per-host filesystems (each host has the artifact for reload), with
    # no silent shared-FS assumption (VERDICT r3 item 7).
    state = jax.device_get(state)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    path = cfg.paths.trained_ann / f"model-{model_id}.msgpack"
    # to_bytes converts the pytree (incl. optax namedtuples) to a state dict
    blob = serialization.to_bytes(payload)
    meta = {
        "model_id": model_id,
        "epoch": epoch,
        "history": history or {},
        "scaler": scaler.to_dict(),
        "config": {
            "features": {
                "used": list(cfg.features.used),
                "used_columns": list(cfg.features.used_columns),
            },
            "training": {
                "hidden_sizes": list(cfg.training.hidden_sizes),
                "dropout": cfg.training.dropout,
                "activation": cfg.training.activation,
                "optimizer": cfg.training.optimizer,
                "learning_rate": cfg.training.learning_rate,
                # split provenance: lets `amc eval` reproduce the EXACT
                # held-out set this checkpoint was validated on — and
                # detect when it can't (dataset/SNR-selection drift)
                "seed": cfg.training.seed,
                "test_size": cfg.training.test_size,
                "training_snr": list(cfg.training.training_snr),
            },
            "signals": {
                "num_frames": cfg.signals.num_frames,
                "num_snr": cfg.signals.num_snr,
                "modulations": list(cfg.signals.modulations_with_noise),
            },
            "n_classes": len(cfg.signals.modulations_with_noise),
            "model": model_meta or {"family": "mlp"},
        },
    }
    meta_path = cfg.paths.trained_ann / f"model-{model_id}.json"
    meta_text = json.dumps(meta, indent=2)

    def _write() -> None:
        import os
        import tempfile

        # atomic: never expose a half-written checkpoint to a reader
        for p, data, mode in ((path, blob, "wb"), (meta_path, meta_text, "w")):
            fd, tmp = tempfile.mkstemp(dir=str(p.parent), prefix=p.name)
            with os.fdopen(fd, mode) as f:
                f.write(data)
            os.replace(tmp, str(p))

    if jax.process_index() == 0:
        _write()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"amcpy_ckpt_{model_id}")
        if not path.exists():  # per-host filesystem: keep a local copy
            _write()
    return path


def load_checkpoint(
    cfg: Config, model_id: str
) -> tuple[Any, TrainState, Standardizer, dict[str, Any]]:
    """Rebuild model + full training state from a checkpoint.

    The ``model`` entry of the sidecar selects the family (feature MLP by
    default; ``family: cnn`` rebuilds the raw-IQ :class:`IQConvNet`)."""
    meta = json.loads(
        (cfg.paths.trained_ann / f"model-{model_id}.json").read_text()
    )
    tcfg = meta["config"]["training"]
    mcfg = meta["config"].get("model") or {"family": "mlp"}
    if mcfg.get("family") == "cnn":
        from amcpy_tpu.models.cnn import IQConvNet

        arch = mcfg.get("arch") or {}
        model = IQConvNet(
            n_classes=meta["config"]["n_classes"],
            **{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in arch.items()
            },
        )
        input_shape = tuple(mcfg["input_shape"])
    else:
        model = AMCClassifier(
            n_classes=meta["config"]["n_classes"],
            hidden_sizes=tuple(tcfg["hidden_sizes"]),
            dropout=tcfg["dropout"],
            activation=tcfg["activation"],
        )
        input_shape = (len(meta["config"]["features"]["used_columns"]),)
    # build a correctly-structured target pytree, then restore bytes into it
    import jax.numpy as jnp

    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, *input_shape), jnp.float32),
        train=False,
    )
    tx = make_optimizer(cfg.replace(training={
        "optimizer": tcfg["optimizer"],
        "learning_rate": tcfg["learning_rate"],
    }))
    target = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
        "step": np.zeros((), np.int32),
    }
    blob = (cfg.paths.trained_ann / f"model-{model_id}.msgpack").read_bytes()
    restored = serialization.from_bytes(target, blob)
    state = TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )
    scaler = Standardizer.from_dict(meta["scaler"])
    return model, state, scaler, meta


def resolve_model_id(cfg: Config, model_id: str | None = None) -> str:
    """Use the given id or fall back to the newest checkpoint by mtime
    (reference behaviour, ``main.py:68-82``)."""
    if model_id:
        return model_id
    ckpts = sorted(
        cfg.paths.trained_ann.glob("model-*.msgpack"),
        key=lambda p: p.stat().st_mtime,
    )
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints in {cfg.paths.trained_ann}")
    newest = ckpts[-1].stem.replace("model-", "")
    print(f"No model ID given — using newest: {newest}")
    return newest
