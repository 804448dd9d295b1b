"""Standalone inference — the reference's ``inference_example``
(pcs.py:398-461) as a reusable API.

Checkpoint -> model -> per-point argmax over a single (N, D) event or a
batch of events. Events are padded to bucket lengths so repeated calls hit
a handful of compiled programs (the compile caches persist across calls).
Accepts either a native framework checkpoint directory or a reference
``best_model.pth`` (pcs.py:401).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.ckpt.checkpoint import load_checkpoint
from pcseg_tpu.ckpt.torch_import import load_best_model_pth
from pcseg_tpu.data.batching import DEFAULT_BUCKETS, pad_events, pick_bucket
from pcseg_tpu.models.pointnet import PointNetSeg


class Predictor:
    """Eval-mode model bound to loaded weights.

    For PointNetSeg, serving uses the BN-folded forward
    (``fold=True`` default): eval BN collapses into the matmuls
    (ops/fold.py), halving per-layer HBM passes. Default dtype float32 keeps
    folded logits within ~1e-5 of the unfolded path; dtype="bfloat16" is
    the fast serving mode; ``fold=False`` gives the exact eval path.
    """

    def __init__(
        self,
        variables: dict,
        num_classes: int,
        input_dim: int = 4,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        model=None,
        fold: bool = True,
        dtype: str = "float32",
        strict_capacity: bool = False,
        mesh=None,
        gp_mesh=None,
    ):
        self.model = model or PointNetSeg(
            num_classes=num_classes, input_dim=input_dim
        )
        if gp_mesh is not None and mesh is not None:
            raise ValueError("pass either mesh (DP serving) or gp_mesh "
                             "(depth-sharded serving), not both")
        self.variables = {
            "params": jax.tree.map(jnp.asarray, variables["params"]),
            "batch_stats": jax.tree.map(jnp.asarray, variables["batch_stats"]),
        }
        self.num_classes = num_classes
        self.input_dim = input_dim
        self.buckets = tuple(sorted(buckets))
        # Serving is padding-invariant: the valid-point mask restricts the
        # global max pool (PointNetSeg) / voxelization (voxel families) so
        # bucket padding cannot influence predictions — matching the
        # reference's UNPADDED inference_example (pcs.py:448) on identical
        # weights.
        self._returns_overflow = False
        self._gp = gp_mesh is not None
        if self._gp:
            # Depth-sharded serving: the same grid parallelism as a
            # parallelism="gp" training run (the reference serves under
            # its training parallelism, pcs.py:412-420) — a grid too big
            # for one chip predicts through the sharded U-Net, not a
            # replicated one. Batch shards over 'data' when that axis
            # exists (>1); else it is replicated across the depth shards.
            from pcseg_tpu.models.voxel_unet import VoxelUNet3d
            from pcseg_tpu.parallel.gp import make_gp_forward
            from pcseg_tpu.parallel.mesh import DATA_AXIS

            if not isinstance(self.model, VoxelUNet3d):
                raise ValueError(
                    "gp_mesh serving depth-shards the voxel grid and needs "
                    f"a voxel_unet3d model, got {type(self.model).__name__}"
                )
            n_data = dict(
                zip(gp_mesh.axis_names, gp_mesh.devices.shape)
            ).get(DATA_AXIS, 1)
            self._forward = make_gp_forward(
                self.model, gp_mesh,
                data_axis=DATA_AXIS if n_data > 1 else None,
            )
            mesh = gp_mesh if n_data > 1 else None
        elif fold and isinstance(self.model, PointNetSeg):
            from pcseg_tpu.models.pointnet import pointnet_apply_folded
            from pcseg_tpu.ops.fold import fold_pointnet

            folded = fold_pointnet(self.variables)
            self._forward = jax.jit(
                lambda v, p, m: pointnet_apply_folded(
                    v, p, compute_dtype=jnp.dtype(dtype), pool_mask=m
                )
            )
            self.variables = folded
        else:
            serve_model = self.model
            if isinstance(serve_model, PointNetSeg):
                # eval-mode BN uses running stats, so this only masks the
                # global max pool
                serve_model = dataclasses.replace(
                    serve_model, mask_norm_and_pool=True
                )
            if hasattr(serve_model, "overflow_counts"):
                # sparse family: one forward returns (logits, dropped) —
                # the capacity count rides the voxelize the forward
                # already did instead of a second jitted pass
                self._forward = jax.jit(
                    lambda v, p, m: serve_model.apply(
                        v, p, train=False, mask=m, return_overflow=True
                    )
                )
                self._returns_overflow = True
            else:
                self._forward = jax.jit(
                    lambda v, p, m: serve_model.apply(
                        v, p, train=False, mask=m
                    )
                )
        # Sparse-family capacity check: events whose occupied sites/tiles
        # exceed the model's static capacity get zero logits for the
        # overflowed voxels — warn (or raise, strict_capacity=True)
        # instead of silently mispredicting.
        self.strict_capacity = strict_capacity
        # Data-axis serving: with a mesh, batched forwards shard the
        # batch over the 'data' axis — the TPU equivalent of the
        # reference wrapping inference in DataParallel (pcs.py:412-420).
        # The model is per-event, so XLA partitions the jitted forward
        # with zero cross-device collectives; params are replicated once.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from pcseg_tpu.parallel.mesh import DATA_AXIS

            self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            rep = NamedSharding(mesh, P())
            self.variables = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.variables
            )
            self._n_data = mesh.shape[DATA_AXIS]
        else:
            self._n_data = 1

    def _check_capacity(self, dropped_counts) -> int:
        """Warn/raise on nonzero dropped-capacity counts (from the
        forward's ``return_overflow`` output)."""
        if dropped_counts is None:
            return 0
        dropped = int(np.asarray(dropped_counts).sum())
        if dropped:
            msg = (
                f"capacity overflow: {dropped} occupied sites/tiles beyond "
                f"the model's static capacity — their points read zero "
                f"logits (raise max_active/max_tiles)"
            )
            if self.strict_capacity:
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, stacklevel=3)
        return dropped

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "Predictor":
        """Load a framework checkpoint dir or a reference .pth file.

        Framework checkpoints carry their config; the stored model family
        (pointnet_seg / voxel_unet3d / sparse_voxelnet) is rebuilt from it.
        """
        if os.path.isfile(path) and path.endswith(".pth"):
            variables, meta = load_best_model_pth(path)
            num_classes = int(meta["num_classes"])  # pcs.py:402
        else:
            raw, meta = load_checkpoint(path)
            variables = {
                "params": raw["params"],
                "batch_stats": raw["batch_stats"],
            }
            num_classes = int(meta["num_classes"])
            model_cfg = (meta.get("config") or {}).get("model")
            if model_cfg and "model" not in kw:
                from pcseg_tpu.core.config import ModelConfig
                from pcseg_tpu.models.factory import build_model

                kw = dict(kw)
                kw["model"] = build_model(
                    ModelConfig(**model_cfg), num_classes
                )
                kw.setdefault(
                    "strict_capacity",
                    bool(model_cfg.get("strict_capacity", False)),
                )
        return cls(variables, num_classes, **kw)

    def logits(self, points: np.ndarray) -> np.ndarray:
        """(N, D) -> (N, C) float32 logits for one event."""
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        bucket = pick_bucket(n, self.buckets)
        labels = np.zeros(n, np.int64)
        # data-sharded serving needs the batch divisible by the data
        # axis — pad with fully-masked dummy events (voxelize and the
        # pool handle all-masked rows)
        pts, _, msk = pad_events([(points, labels)], bucket,
                                 batch_size=max(1, self._n_data),
                                 feature_dim=self.input_dim)
        pts, msk = jnp.asarray(pts), jnp.asarray(msk)
        if self.mesh is not None:
            pts = jax.device_put(pts, self._batch_sharding)
            msk = jax.device_put(msk, self._batch_sharding)
        out = self._forward(self.variables, pts, msk)
        if self._returns_overflow:
            out, dropped = out
            self._check_capacity(dropped)
        return np.asarray(out)[0, :n]

    def predict(self, points: np.ndarray) -> np.ndarray:
        """(N, D) -> (N,) int per-point class (argmax, pcs.py:452)."""
        return np.argmax(self.logits(points), axis=-1)

    def predict_batch(
        self, events: Sequence[np.ndarray], batch_size: int = 8
    ) -> list[np.ndarray]:
        """Batch of ragged events -> list of per-point predictions.

        Events are grouped by pad bucket and run ``batch_size`` at a time,
        so serving amortizes dispatch over the batch and compiles one
        program per (bucket, batch_size) pair.
        """
        events = [np.asarray(e, np.float32) for e in events]
        # mesh serving shards the batch dim over 'data' — keep it divisible
        if self._n_data > 1 and batch_size % self._n_data:
            batch_size += self._n_data - batch_size % self._n_data
        order = sorted(
            range(len(events)), key=lambda i: events[i].shape[0]
        )
        out: list = [None] * len(events)
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            group = [events[i] for i in idx]
            bucket = pick_bucket(
                max(e.shape[0] for e in group), self.buckets
            )
            padded = [
                (e, np.zeros(e.shape[0], np.int64)) for e in group
            ]
            pts, _, msk = pad_events(
                padded, bucket, batch_size=batch_size,
                feature_dim=self.input_dim,
            )
            pts, msk = jnp.asarray(pts), jnp.asarray(msk)
            if self.mesh is not None:
                pts = jax.device_put(pts, self._batch_sharding)
                msk = jax.device_put(msk, self._batch_sharding)
            fwd = self._forward(self.variables, pts, msk)
            if self._returns_overflow:
                fwd, dropped = fwd
                self._check_capacity(dropped)
            logits = np.asarray(fwd)
            for j, i in enumerate(idx):
                n = events[i].shape[0]
                out[i] = np.argmax(logits[j, :n], axis=-1)
        return out


def inference_example(
    checkpoint_path: str,
    dataset,
    event_idx: int = 0,
    log=print,
) -> np.ndarray:
    """The reference demo (pcs.py:398-461): load checkpoint, predict event
    ``event_idx``, report accuracy vs true labels, return predictions."""
    predictor = Predictor.from_checkpoint(checkpoint_path)
    points, true_labels = dataset[event_idx]
    preds = predictor.predict(points)
    acc = float((preds == np.asarray(true_labels)).mean()) * 100.0
    log(f"event {event_idx}: {points.shape[0]} points, accuracy {acc:.2f}%")
    return preds
