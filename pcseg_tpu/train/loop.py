"""Epoch driver — the reference's ``train_model`` (pcs.py:135-396) rebuilt.

Policy reproduced exactly:
- class scan + weighting on the first <=1000 events (pcs.py:146-189);
- 80/20 train/val split (pcs.py:192-194) — seeded here, unlike the
  reference's unseeded split;
- per epoch: train pass, val pass, per-class F1, StepLR step
  (pcs.py:228-349). F1 comes from the confusion matrix accumulated
  DURING the val pass (identical numbers to the reference's separate
  third sweep over val, pcs.py:314-346, at a third of the cost);
- train/val loss = mean of per-batch weighted-CE values (pcs.py:273, 311);
- best-model selection: higher class-2 F1, or equal F1 and lower val loss
  (pcs.py:359-369); checkpoint on improvement (pcs.py:371-382);
- early stop after ``patience`` epochs without improvement (pcs.py:388-391).

TPU-native differences: one compiled step per bucket shape, async dispatch
(no per-batch host sync), shard_map DP over the mesh, true resume support.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.config import Config
from pcseg_tpu.core import prng
from pcseg_tpu.ckpt.checkpoint import save_checkpoint, load_checkpoint
from pcseg_tpu.data.batching import BucketBatcher
from pcseg_tpu.data.prefetch import prefetch
from pcseg_tpu.data.class_stats import scan_classes, ClassStats
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.ops.metrics import f1_from_confusion
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh
from pcseg_tpu.train.optim import make_optimizer, step_lr
from pcseg_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    model: PointNetSeg
    num_classes: int
    class_weights: np.ndarray
    best_f1_target: float
    best_val_loss: float
    best_epoch: int
    history: list[dict]
    checkpoint_path: str


def split_indices(n: int, val_fraction: float, seed: int):
    """80/20 random split, seeded. Sizes mirror the reference exactly:
    train = int((1 - val_fraction) * n), val = remainder (pcs.py:192-194;
    e.g. n=11 gives 8/3, not round()'s 9/2)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int((1.0 - val_fraction) * n)
    return perm[:n_train], perm[n_train:]


def _make_strategy_train_step(strategy, model, optimizer, mesh, sync_bn):
    """Build the train step for ``train.parallelism`` (core/config.py).

    Every strategy shares the step signature ``step(state, batch, lr,
    dropout_key, class_weights) -> (state, metrics)``, so the epoch loop
    is strategy-agnostic. Family guards fail fast: SP/TP are PointNet
    mechanisms, GP is a voxel-grid mechanism.
    """
    if strategy == "dp":
        return make_train_step(model, optimizer, mesh, sync_batchnorm=sync_bn)
    if strategy == "sp":
        if not isinstance(model, PointNetSeg):
            raise ValueError(
                "train.parallelism='sp' shards the point axis and needs "
                f"model.name='pointnet_seg', got {type(model).__name__}"
            )
        from pcseg_tpu.parallel.sp import make_sp_train_step

        return make_sp_train_step(
            model, optimizer, mesh, sync_batchnorm=sync_bn
        )
    if strategy == "tp":
        if not isinstance(model, PointNetSeg):
            raise ValueError(
                "train.parallelism='tp' shards the wide PointNet layers "
                f"and needs model.name='pointnet_seg', got "
                f"{type(model).__name__}"
            )
        from pcseg_tpu.parallel.tp import make_tp_train_step

        return make_tp_train_step(
            model, optimizer, mesh, sync_batchnorm=sync_bn
        )
    if strategy == "gp":
        from pcseg_tpu.models.voxel_unet import VoxelUNet3d

        if not isinstance(model, VoxelUNet3d):
            raise ValueError(
                "train.parallelism='gp' depth-shards the voxel grid and "
                f"needs model.name='voxel_unet3d', got "
                f"{type(model).__name__}"
            )
        from pcseg_tpu.parallel.gp import make_gp_train_step

        return make_gp_train_step(model, mesh, optimizer)
    raise ValueError(
        f"unknown train.parallelism {strategy!r}; "
        "expected one of 'dp', 'sp', 'tp', 'gp'"
    )


def _make_strategy_eval_step(strategy, model, mesh, num_classes, optimizer):
    """Eval step matching ``train.parallelism`` — validation must run
    under the SAME sharding as training (the reference runs inference
    under its training parallelism, pcs.py:412-420): a GP run's grid may
    not fit one chip replicated, and a TP run's params stay Megatron-
    sharded instead of being gathered every eval pass."""
    if strategy == "gp":
        from pcseg_tpu.parallel.gp import make_gp_eval_step

        return make_gp_eval_step(model, mesh, num_classes)
    if strategy == "tp":
        from pcseg_tpu.parallel.tp import make_tp_eval_step

        return make_tp_eval_step(model, mesh, num_classes, optimizer)
    # dp and sp: the replicated-variables eval step (an SP train run's
    # state is replicated; eval batches shard over the data axis)
    return make_eval_step(model, mesh, num_classes)


def _run_epoch_train(
    train_step, batcher, state, lr, cw, root, epoch, log, log_every=0
):
    """One training pass. Metrics stay on device until the epoch ends —
    the reference syncs on ``loss.item()`` every batch (pcs.py:258); here
    dispatch runs ahead asynchronously. Progress lines (``log_every``) are
    LAGGED: at step i they report step ``i - log_every``, which finished
    executing while the later steps were being dispatched, so the reads
    are transfers of materialized values, not device syncs."""
    metrics_list = []
    for i, (points, labels, masks) in enumerate(batcher):
        dk = prng.purpose_key(root, "dropout", epoch * 1_000_000 + i)
        state, metrics = train_step(state, (points, labels, masks), lr, dk, cw)
        metrics_list.append(metrics)
        if log_every and (i + 1) % log_every == 0 and i + 1 > log_every:
            j = i - log_every
            m = metrics_list[j]
            tot = float(m["total"])
            acc = 100.0 * float(m["correct"]) / tot if tot > 0 else 0.0
            log(
                f"  step {j + 1}: loss {float(m['loss']):.4f} "
                f"acc {acc:.2f}%"
            )
    losses = [float(m["loss"]) for m in metrics_list]
    correct = sum(float(m["correct"]) for m in metrics_list)
    total = sum(float(m["total"]) for m in metrics_list)
    dropped = sum(int(m["dropped"]) for m in metrics_list if "dropped" in m)
    loss = float(np.mean(losses)) if losses else 0.0
    acc = 100.0 * correct / total if total > 0 else 0.0
    return state, loss, acc, dropped


def _run_epoch_eval(eval_step, batcher, state, num_classes, cw):
    metrics_list = []
    for points, labels, masks in batcher:
        metrics_list.append(eval_step(state, (points, labels, masks), cw))
    losses = [float(m["loss"]) for m in metrics_list]
    correct = sum(float(m["correct"]) for m in metrics_list)
    total = sum(float(m["total"]) for m in metrics_list)
    dropped = sum(int(m["dropped"]) for m in metrics_list if "dropped" in m)
    cm = np.zeros((num_classes, num_classes), np.int64)
    for m in metrics_list:
        cm += np.asarray(m["confusion"], np.int64)
    loss = float(np.mean(losses)) if losses else 0.0
    acc = 100.0 * correct / total if total > 0 else 0.0
    return loss, acc, cm, dropped


def train_model(
    cfg: Config,
    dataset,
    mesh=None,
    resume_from: Optional[str] = None,
    log=print,
) -> TrainResult:
    """Full training run. ``dataset`` is any map-style (points, labels)
    dataset (``data.PointCloudDataset`` or in-memory list)."""
    t_cfg, d_cfg, m_cfg, o_cfg = cfg.train, cfg.data, cfg.model, cfg.optim
    if t_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # multi-host rendezvous BEFORE the first device query (no-op when no
    # coordinator is configured — the single-process default)
    from pcseg_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        t_cfg.coordinator_address or None,
        t_cfg.num_processes or None,
        t_cfg.process_id if t_cfg.process_id >= 0 else None,
    )

    # --- class analysis (pcs.py:146-189)
    stats: ClassStats = scan_classes(
        dataset,
        scan_events=d_cfg.class_scan_events,
        target_class=t_cfg.target_class,
        target_boost=t_cfg.target_class_weight_boost,
    )
    num_classes = m_cfg.num_classes or stats.num_classes
    class_weights = stats.weights
    if len(class_weights) != num_classes:
        # config forced a wider logit dim than the scan saw
        w = np.ones(num_classes, np.float32)
        w[: len(class_weights)] = class_weights
        class_weights = w
    log(f"classes: {num_classes}, counts: {stats.counts}")
    log(f"class weights: {np.round(class_weights, 3).tolist()}")

    # --- split + batchers (pcs.py:191-203)
    train_idx, val_idx = split_indices(
        len(dataset), d_cfg.val_fraction, d_cfg.split_seed
    )
    train_batcher = BucketBatcher(
        dataset,
        d_cfg.batch_size,
        buckets=d_cfg.buckets,
        indices=train_idx,
        shuffle=True,
        seed=d_cfg.shuffle_seed,
        feature_dim=m_cfg.input_dim,
    )
    val_batcher = BucketBatcher(
        dataset,
        d_cfg.batch_size,
        buckets=d_cfg.buckets,
        indices=val_idx,
        shuffle=False,
        feature_dim=m_cfg.input_dim,
    )
    log(f"train events: {len(train_idx)}, val events: {len(val_idx)}")

    # --- model/optim/mesh (pcs.py:205-218)
    if mesh is None:
        mesh = make_mesh(MeshSpec(
            data=t_cfg.data_parallel or 0, model=t_cfg.model_parallel,
        ))
    from pcseg_tpu.models.factory import build_model

    model = build_model(m_cfg, num_classes)
    optimizer = make_optimizer(
        weight_decay=o_cfg.weight_decay,
        b1=o_cfg.beta1,
        b2=o_cfg.beta2,
        eps=o_cfg.eps,
    )
    root = prng.root_key(t_cfg.seed)
    state = create_train_state(model, prng.purpose_key(root, "params"), optimizer)
    start_epoch = 0
    resume_meta: dict = {}
    if resume_from:
        raw, resume_meta = load_checkpoint(resume_from, target=state)
        state = raw
        start_epoch = int(resume_meta.get("epoch", -1)) + 1
        log(f"resumed from {resume_from} at epoch {start_epoch}")

    cw = jnp.asarray(class_weights)
    train_step = _make_strategy_train_step(
        t_cfg.parallelism, model, optimizer, mesh, t_cfg.sync_batchnorm
    )
    if t_cfg.parallelism == "tp":
        # place params/optimizer state on their Megatron shardings (the
        # wide layers live split over the model axis at rest); also
        # re-places a resumed (host-replicated) state
        from jax.sharding import NamedSharding

        from pcseg_tpu.parallel.tp import tp_state_specs

        specs = tp_state_specs(model, optimizer)
        state = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state, specs,
        )
    eval_step = _make_strategy_eval_step(
        t_cfg.parallelism, model, mesh, num_classes, optimizer
    )

    # Background prefetch threads keep `prefetch_depth` batches read,
    # packed, and device_put ahead of the compute stream (replaces the
    # reference's 32 DataLoader worker processes, pcs.py:199-201).
    if d_cfg.prefetch_depth > 0:
        from pcseg_tpu.parallel.mesh import shard_batch

        place = lambda b: shard_batch(mesh, b)  # noqa: E731
        train_iter = prefetch(train_batcher, d_cfg.prefetch_depth, place)
        val_iter = prefetch(val_batcher, d_cfg.prefetch_depth, place)
    else:
        train_iter, val_iter = train_batcher, val_batcher

    ckpt_path = os.path.join(t_cfg.checkpoint_dir, t_cfg.checkpoint_name)

    from pcseg_tpu.utils.observe import MetricsLogger, profile_trace

    metrics_logger = MetricsLogger(
        t_cfg.metrics_log or None, t_cfg.tensorboard_dir
    )

    # --- epoch loop (pcs.py:220-396)
    # On resume, restore the best-model-selection state so a worse
    # post-resume epoch cannot overwrite a better best checkpoint and the
    # early-stop clock keeps counting. A 'latest' checkpoint carries the
    # full selection state; resuming from a best-model checkpoint falls
    # back to its own metrics (f1_class_target/val_loss, zero patience).
    best_f1_target = float(
        resume_meta.get(
            "best_f1_target", resume_meta.get("f1_class_target", 0.0)
        )
    )
    best_val_loss = float(
        resume_meta.get(
            "best_val_loss", resume_meta.get("val_loss", float("inf"))
        )
    )
    best_epoch = int(
        resume_meta.get("best_epoch", resume_meta.get("epoch", -1))
        if best_f1_target > 0.0 or "best_epoch" in resume_meta
        else -1
    )
    patience_counter = int(resume_meta.get("patience_counter", 0))
    history: list[dict] = []

    for epoch in range(start_epoch, t_cfg.num_epochs):
        lr = step_lr(o_cfg.lr, epoch, o_cfg.lr_step_epochs, o_cfg.lr_gamma)
        t0 = time.perf_counter()
        trace_ctx = (
            profile_trace(t_cfg.profile_dir)
            if t_cfg.profile_dir and epoch == start_epoch
            else contextlib.nullcontext()
        )
        with trace_ctx:
            state, train_loss, train_acc, train_dropped = _run_epoch_train(
                train_step, train_iter, state, lr, cw, root, epoch, log,
                t_cfg.log_every_steps,
            )
        val_loss, val_acc, cm, val_dropped = _run_epoch_eval(
            eval_step, val_iter, state, num_classes, cw
        )
        if train_dropped or val_dropped:
            # sparse capacity exhaustion: points in the dropped sites/tiles
            # read zero logits (ops/sparse.py, ops/block_sparse.py) —
            # never let that pass silently
            msg = (
                f"capacity overflow: {train_dropped} train / "
                f"{val_dropped} val occupied sites/tiles beyond the "
                f"static capacity this epoch (raise model.max_active / "
                f"model.max_tiles)"
            )
            if m_cfg.strict_capacity:
                raise RuntimeError(msg)
            log(f"WARNING: {msg}")
        f1 = f1_from_confusion(cm)
        f1_target = (
            float(f1.per_class[t_cfg.target_class])
            if len(f1.per_class) > t_cfg.target_class
            else 0.0
        )  # pcs.py:346 guard
        dt = time.perf_counter() - t0

        record = {
            "epoch": epoch,
            "lr": lr,
            "train_loss": train_loss,
            "train_acc": train_acc,
            "val_loss": val_loss,
            "val_acc": val_acc,
            "f1_macro": f1.macro,
            "f1_weighted": f1.weighted,
            "f1_per_class": f1.per_class.tolist(),
            "f1_target": f1_target,
            "dropped_train": train_dropped,
            "dropped_val": val_dropped,
            "seconds": dt,
        }
        history.append(record)
        metrics_logger.log(epoch, record)
        log(
            f"epoch {epoch + 1}/{t_cfg.num_epochs}: "
            f"train {train_loss:.4f}/{train_acc:.2f}% "
            f"val {val_loss:.4f}/{val_acc:.2f}% "
            f"f1[c{t_cfg.target_class}] {f1_target:.4f} "
            f"macro {f1.macro:.4f} lr {lr:.6f} ({dt:.1f}s)"
        )

        # best-model selection (pcs.py:359-369)
        improved = False
        if f1_target > best_f1_target:
            best_f1_target, best_val_loss, improved = f1_target, val_loss, True
        elif f1_target == best_f1_target and val_loss < best_val_loss:
            best_val_loss, improved = val_loss, True

        if improved:
            patience_counter = 0
            best_epoch = epoch
            save_checkpoint(
                ckpt_path,
                state,
                metadata={
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "f1_class_target": f1_target,
                    "f1_per_class": f1.per_class.tolist(),
                    "num_classes": num_classes,
                    "class_weights": class_weights.tolist(),
                    "config": cfg.to_dict(),
                },
            )
            log(f"saved best checkpoint (f1={f1_target:.4f}) -> {ckpt_path}")
        else:
            patience_counter += 1
            log(f"no improvement for {patience_counter}/{t_cfg.patience} epochs")

        # failure recovery: rolling 'latest' checkpoint (resume target).
        # Written AFTER selection so the stored selection state includes
        # this epoch — a resumed run continues seamlessly.
        if (
            t_cfg.save_latest_every > 0
            and (epoch + 1) % t_cfg.save_latest_every == 0
        ):
            save_checkpoint(
                os.path.join(t_cfg.checkpoint_dir, "latest"),
                state,
                metadata={
                    "epoch": epoch,
                    "num_classes": num_classes,
                    "class_weights": class_weights.tolist(),
                    "config": cfg.to_dict(),
                    "best_f1_target": best_f1_target,
                    "best_val_loss": best_val_loss,
                    "best_epoch": best_epoch,
                    "patience_counter": patience_counter,
                },
            )

        if patience_counter >= t_cfg.patience:   # pcs.py:388-391
            log("early stopping")
            break

    metrics_logger.close()
    return TrainResult(
        state=state,
        model=model,
        num_classes=num_classes,
        class_weights=class_weights,
        best_f1_target=best_f1_target,
        best_val_loss=best_val_loss,
        best_epoch=best_epoch,
        history=history,
        checkpoint_path=ckpt_path,
    )
