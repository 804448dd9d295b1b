"""High-level API: fit / predict on raw arrays.

The north-star public surface (BASELINE.json): ``fit`` on a dataset of
``(N, 3+F)`` arrays + labels, ``predict`` per-point classes — wrapping the
reference's script-level workflow (pcs.py:463-484) as a library.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pcseg_tpu.core.config import Config, apply_overrides
from pcseg_tpu.data.hdf5 import PointCloudDataset
from pcseg_tpu.infer import Predictor
from pcseg_tpu.train.loop import TrainResult, train_model


class ArrayDataset:
    """Map-style dataset over in-memory ragged events."""

    def __init__(self, events: Sequence[tuple[np.ndarray, np.ndarray]]):
        self.events = [
            (np.asarray(p, np.float32), np.asarray(l, np.int64))
            for p, l in events
        ]

    def __len__(self):
        return len(self.events)

    def __getitem__(self, idx):
        return self.events[idx]

    def num_points(self, idx):
        return self.events[idx][0].shape[0]


def fit(
    events: Optional[Sequence[tuple[np.ndarray, np.ndarray]]] = None,
    *,
    data_path: Optional[str] = None,
    label_path: Optional[str] = None,
    config: Optional[Config] = None,
    overrides: Sequence[str] = (),
    resume_from: Optional[str] = None,
    log=print,
) -> TrainResult:
    """Train on in-memory events or HDF5 files; returns the TrainResult
    (with ``checkpoint_path`` for ``predictor``/``predict``).

    ``resume_from``: a checkpoint directory (usually
    ``<checkpoint_dir>/latest``) to continue from — params, opt_state,
    epoch counter, and best-model-selection state all restore (the
    reference saves optimizer state but never loads it, pcs.py:376)."""
    cfg = config or Config()
    apply_overrides(cfg, overrides)
    if events is not None:
        dataset = ArrayDataset(events)
        return train_model(cfg, dataset, resume_from=resume_from, log=log)
    dp = data_path or cfg.data.data_path
    lp = label_path or cfg.data.label_path
    with PointCloudDataset(dp, lp, feature_dim=cfg.model.input_dim) as ds:
        return train_model(cfg, ds, resume_from=resume_from, log=log)


def evaluate(
    checkpoint_path: str,
    events: Optional[Sequence[tuple[np.ndarray, np.ndarray]]] = None,
    *,
    data_path: Optional[str] = None,
    label_path: Optional[str] = None,
    batch_size: int = 64,
    buckets: Sequence[int] = (256, 512, 1024, 2048, 4096, 8192),
) -> dict:
    """Standalone evaluation: checkpoint + labeled events -> metrics.

    Returns {loss, accuracy, f1_macro, f1_weighted, f1_per_class,
    confusion} computed exactly like the training-time validation pass
    (masked accuracy pcs.py:298-304; sklearn-convention F1 pcs.py:341-343)
    but usable on any dataset after the fact — the reference has no
    standalone eval entry point.
    """
    import jax
    import jax.numpy as jnp

    from pcseg_tpu.ckpt.checkpoint import load_checkpoint
    from pcseg_tpu.core.config import ModelConfig
    from pcseg_tpu.data.batching import BucketBatcher
    from pcseg_tpu.models.factory import build_model
    from pcseg_tpu.ops.metrics import f1_from_confusion
    from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh
    from pcseg_tpu.train.loop import _run_epoch_eval
    from pcseg_tpu.train.steps import TrainState, make_eval_step

    raw, meta = load_checkpoint(checkpoint_path)
    num_classes = int(meta["num_classes"])
    model_cfg = ModelConfig(**((meta.get("config") or {}).get("model") or {}))
    model = build_model(model_cfg, num_classes)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=raw["params"],
        batch_stats=raw["batch_stats"],
        opt_state=(),
    )

    if events is not None:
        dataset = ArrayDataset(events)
    else:
        dataset = PointCloudDataset(
            data_path, label_path, feature_dim=model_cfg.input_dim
        )
    cw = jnp.asarray(
        meta.get("class_weights") or np.ones(num_classes), jnp.float32
    )
    mesh = make_mesh(MeshSpec())
    eval_step = make_eval_step(model, mesh, num_classes)
    batcher = BucketBatcher(
        dataset, batch_size, buckets=buckets,
        feature_dim=model_cfg.input_dim,
    )
    loss, acc, cm, dropped = _run_epoch_eval(
        eval_step, batcher, state, num_classes, cw
    )
    f1 = f1_from_confusion(cm)
    if events is None:
        dataset.close()
    return {
        "loss": loss,
        "accuracy": acc,
        "f1_macro": f1.macro,
        "f1_weighted": f1.weighted,
        "f1_per_class": f1.per_class.tolist(),
        # sparse-family capacity overflow (0 elsewhere): occupied
        # sites/tiles beyond the static capacity across the dataset
        "dropped": dropped,
        "confusion": cm.tolist(),
    }


def predictor(checkpoint_path: str, **kw) -> Predictor:
    """Load a trained model (framework dir or reference .pth)."""
    return Predictor.from_checkpoint(checkpoint_path, **kw)


def predict(checkpoint_path: str, points: np.ndarray, **kw) -> np.ndarray:
    """One-shot: checkpoint + (N, D) points -> (N,) predicted classes."""
    return predictor(checkpoint_path, **kw).predict(points)
