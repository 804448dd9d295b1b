"""AOT-compiled serving artifacts — ``jax.export`` of the Predictor forward.

The reference's serving story is "load ``best_model.pth`` into Python and
call the module" (pcs.py:398-432): serving needs the full model source,
torch, and a pickle-bearing checkpoint (``weights_only=False``,
pcs.py:401). The TPU-native production equivalent built here: the
Predictor's jitted forward is serialized per (batch, bucket) shape as
versioned StableHLO via ``jax.export`` — an artifact a serving host
replays against the bundled weights with **no model code and no
retracing** (XLA AOT-compiles the deserialized module once per process),
which is how fleet rollouts avoid the trace-at-startup cost and the
model-code/weights version-skew class of serving bugs entirely.

Artifact layout (one directory):

- ``manifest.json``            — shapes, classes, flags, platforms
- ``weights/``                 — the Predictor's (folded) variables,
  flax msgpack via ckpt.checkpoint — pure arrays, no pickle
- ``fwd_b{B}_m{M}.stablehlo``  — ``jax.export`` serialization of the
  forward at batch ``B`` x bucket ``M``

Shapes are exported per pad bucket — the same static-shape bucketing the
whole framework uses (SURVEY.md §5 long-context) — so the artifact holds
one compiled program per served shape instead of relying on symbolic
dims, which keeps each program at XLA's full static-shape optimization
level.

Note on platforms: an ``Exported`` replays only on the platform(s) it was
lowered for (default: the exporting process's backend). Export on the
serving platform, or pass ``platforms=("tpu", "cpu")`` to lower for both.
Models whose forward takes Pallas kernels pick compiled-vs-interpret at
TRACE time, so a multi-platform export lowers the PORTABLE XLA forward
instead: fused-conv voxel models are cloned onto ``conv_impl="xla"`` and
every backend-gated fast path (voxelize/devoxelize plane kernels, fused
LN, one-hot halo) traces its XLA form under
``core.portable.force_xla_paths()``. Pass ``portable="strict"`` to get
the old refusal instead (e.g. to guarantee the single-platform fused
artifact is the one being shipped).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import numpy as np

from pcseg_tpu.data.batching import pad_events, pick_bucket

_MANIFEST_VERSION = 1


def _spec_tree(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree
    )


def _portable_clone(predictor):
    """A Predictor whose forward traces only portable XLA ops.

    Fused-conv voxel models (``conv_impl`` in fused/auto) re-bind onto
    ``conv_impl="xla"`` — same weights, same values (the fused core is
    parity-tested against the XLA core), portable lowering. Other models
    come back unchanged; their backend gates are handled by
    ``force_xla_paths`` at trace time.
    """
    import dataclasses

    from pcseg_tpu.infer import Predictor

    model = getattr(predictor, "model", None)
    if getattr(model, "conv_impl", None) not in ("fused", "auto"):
        return predictor
    return Predictor(
        predictor.variables,
        predictor.num_classes,
        input_dim=predictor.input_dim,
        buckets=predictor.buckets,
        model=dataclasses.replace(model, conv_impl="xla"),
        fold=False,
        strict_capacity=predictor.strict_capacity,
    )


def export_predictor(
    predictor,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 8),
    buckets: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
    portable: str = "auto",
) -> dict:
    """Serialize ``predictor``'s forward per (batch, bucket) into
    ``out_dir``; returns the manifest dict.

    ``buckets`` defaults to the predictor's pad buckets. ``platforms``
    defaults to the current backend; pass e.g. ``("tpu", "cpu")`` for a
    multi-platform artifact — the lowering then uses the portable XLA
    forward (fused-conv models cloned to ``conv_impl="xla"``, backend-
    gated kernels forced off; see module note). ``portable="strict"``
    refuses multi-platform export of Pallas-bearing models instead.
    """
    import contextlib

    from jax import export as jx

    from pcseg_tpu.ckpt.checkpoint import save_checkpoint
    from pcseg_tpu.core.portable import force_xla_paths

    buckets = tuple(sorted(buckets or predictor.buckets))
    batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
    ctx = contextlib.nullcontext()
    if platforms is not None:
        platforms = tuple(platforms)
        if len(platforms) > 1:
            uses_pallas = getattr(
                getattr(predictor, "model", None), "conv_impl", None
            ) in ("fused", "auto")
            if portable == "strict" and uses_pallas:
                raise ValueError(
                    "multi-platform export of a fused-Pallas forward would "
                    "bake the exporting backend's compiled/interpret choice "
                    "into every platform; export per platform instead "
                    "(or drop portable='strict' to lower the XLA forward)"
                )
            predictor = _portable_clone(predictor)
            ctx = force_xla_paths()

    os.makedirs(out_dir, exist_ok=True)
    save_checkpoint(os.path.join(out_dir, "weights"), predictor.variables)

    var_specs = _spec_tree(predictor.variables)
    dim = predictor.input_dim
    exported_platforms = None
    with ctx:
        for b in batch_sizes:
            for m in buckets:
                exp = jx.export(
                    predictor._forward,
                    platforms=list(platforms) if platforms else None,
                )(
                    var_specs,
                    jax.ShapeDtypeStruct((b, m, dim), np.float32),
                    jax.ShapeDtypeStruct((b, m), np.bool_),
                )
                exported_platforms = list(exp.platforms)
                with open(
                    os.path.join(out_dir, f"fwd_b{b}_m{m}.stablehlo"), "wb"
                ) as f:
                    f.write(exp.serialize())

    manifest = {
        "version": _MANIFEST_VERSION,
        "num_classes": int(predictor.num_classes),
        "input_dim": int(dim),
        "batch_sizes": list(batch_sizes),
        "buckets": list(buckets),
        "returns_overflow": bool(predictor._returns_overflow),
        "platforms": exported_platforms,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedPredictor:
    """Predictor API replayed from an exported artifact — no model code.

    Mirrors ``infer.Predictor``'s ``logits`` / ``predict`` /
    ``predict_batch`` contract (per-point argmax, ragged events padded to
    the exported buckets), including the sparse families' capacity-
    overflow surfacing when the artifact recorded it.
    """

    def __init__(self, path: str, strict_capacity: bool = False):
        from pcseg_tpu.ckpt.checkpoint import load_checkpoint

        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        if self.manifest["version"] != _MANIFEST_VERSION:
            raise ValueError(
                f"unsupported artifact version {self.manifest['version']}"
            )
        backend = jax.default_backend()
        if backend not in self.manifest["platforms"]:
            raise ValueError(
                f"artifact was exported for {self.manifest['platforms']}, "
                f"current backend is {backend!r} — re-export on this "
                "platform or pass platforms=(...) at export time"
            )
        self.path = path
        self.variables, _ = load_checkpoint(os.path.join(path, "weights"))
        self.num_classes = self.manifest["num_classes"]
        self.input_dim = self.manifest["input_dim"]
        self.buckets = tuple(self.manifest["buckets"])
        self.batch_sizes = tuple(self.manifest["batch_sizes"])
        self.strict_capacity = strict_capacity
        self._fns: dict = {}

    def _fn(self, b: int, m: int):
        if (b, m) not in self._fns:
            from jax import export as jx

            fname = os.path.join(self.path, f"fwd_b{b}_m{m}.stablehlo")
            with open(fname, "rb") as f:
                self._fns[(b, m)] = jx.deserialize(f.read()).call
        return self._fns[(b, m)]

    def _check_capacity(self, dropped) -> None:
        from pcseg_tpu.infer import Predictor

        Predictor._check_capacity(self, dropped)

    def _run(self, b: int, m: int, pts, msk):
        out = self._fn(b, m)(self.variables, pts, msk)
        if self.manifest["returns_overflow"]:
            out, dropped = out
            self._check_capacity(dropped)
        return np.asarray(out)

    def logits(self, points: np.ndarray) -> np.ndarray:
        """(N, D) -> (N, C) float32 logits for one event."""
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        bucket = pick_bucket(n, self.buckets)
        b = self.batch_sizes[0]
        pts, _, msk = pad_events(
            [(points, np.zeros(n, np.int64))], bucket, batch_size=b,
            feature_dim=self.input_dim,
        )
        return self._run(b, bucket, pts, msk)[0, :n]

    def predict(self, points: np.ndarray) -> np.ndarray:
        """(N, D) -> (N,) int per-point class (argmax, pcs.py:452)."""
        return np.argmax(self.logits(points), axis=-1)

    def predict_batch(
        self, events: Sequence[np.ndarray], batch_size: Optional[int] = None
    ) -> list[np.ndarray]:
        """Ragged events -> per-point predictions via the exported
        programs; groups by bucket at the largest exported batch size
        (or ``batch_size``, which must be an exported one)."""
        if batch_size is None:
            batch_size = self.batch_sizes[-1]
        elif batch_size not in self.batch_sizes:
            raise ValueError(
                f"batch_size {batch_size} not in exported {self.batch_sizes}"
            )
        events = [np.asarray(e, np.float32) for e in events]
        order = sorted(range(len(events)), key=lambda i: events[i].shape[0])
        out: list = [None] * len(events)
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            group = [events[i] for i in idx]
            bucket = pick_bucket(max(e.shape[0] for e in group), self.buckets)
            padded = [(e, np.zeros(e.shape[0], np.int64)) for e in group]
            pts, _, msk = pad_events(
                padded, bucket, batch_size=batch_size,
                feature_dim=self.input_dim,
            )
            logits = self._run(batch_size, bucket, pts, msk)
            for j, i in enumerate(idx):
                n = events[i].shape[0]
                out[i] = np.argmax(logits[j, :n], axis=-1)
        return out


def load_exported(path: str, strict_capacity: bool = False) -> ExportedPredictor:
    """Open an artifact written by :func:`export_predictor`."""
    return ExportedPredictor(path, strict_capacity=strict_capacity)
