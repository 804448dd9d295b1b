"""Jitted train/eval steps with mesh data parallelism.

Replaces the reference's per-batch step logic (pcs.py:236-271 train,
:276-312 val) and its ``nn.DataParallel`` scatter/gather (pcs.py:209-213):

- the step is ONE compiled program per bucket shape (forward + loss +
  backward + Adam + metrics) — no per-step host sync; the reference syncs
  on ``loss.item()`` every batch (pcs.py:258);
- data parallelism is ``shard_map`` over the mesh ``data`` axis: each
  device sees its batch shard, computes grads, and a ``psum`` mean-reduces
  them over ICI (the explicit equivalent of DataParallel's implicit
  gradient averaging);
- BN batch statistics are per-replica by default (DataParallel semantics,
  SURVEY.md §2.2); the canonical running stats keep REPLICA 0's update —
  exactly what ``nn.DataParallel`` does (replica 0 is the original module,
  the other replicas' buffer updates are discarded). Averaging per-shard
  unbiased variances instead would drop the between-shard mean component
  and underestimate the global variance. ``sync_batchnorm=True``
  psum-pools the batch moments instead (true sync-BN; stats identical on
  every replica by construction).
- eval accumulates loss/accuracy AND the confusion matrix in one pass,
  replacing the reference's separate third F1 sweep (pcs.py:314-346).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.ops.losses import cross_entropy_sums
from pcseg_tpu.ops.metrics import confusion_matrix, masked_accuracy
from pcseg_tpu.parallel.mesh import DATA_AXIS
from pcseg_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    step: jax.Array          # int32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model: PointNetSeg,
    key: jax.Array,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    variables = model.init(key)
    tx = optimizer if optimizer is not None else make_optimizer()
    opt_state = tx.init(variables["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
    )


def _make_mapped_train_step(
    model: PointNetSeg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    sync_batchnorm: bool = False,
):
    """The shard_map-wrapped (un-jitted) train step; shared by
    ``make_train_step`` (jits it) and ``make_scan_train_steps`` (scans it).
    """
    bn_axis = DATA_AXIS if sync_batchnorm else None
    # Classifier+CE fused into one kernel (ops/pallas/fused_ce.py): the
    # (N, C) logits never reach HBM and no C/128-lane-efficiency XLA loss
    # ops run. Per-replica BN only (same constraint as the fused chain).
    use_fused_loss = (
        not sync_batchnorm
        and getattr(model, "supports_fused_loss", lambda: False)()
    )

    def step(state: TrainState, batch, lr, dropout_key, class_weights):
        points, labels, masks = batch
        # Decorrelate dropout masks across replicas (DataParallel replicas
        # also draw independent masks).
        dropout_key = jax.random.fold_in(
            dropout_key, jax.lax.axis_index(DATA_AXIS)
        )
        # Static-shape gate: the fused kernels tile the point axis in
        # multiples of 8 (models/pointnet_fused._pick_tile raises on
        # indivisible shapes); odd bucket sizes take the XLA path.
        fused_here = use_fused_loss and points.shape[1] % 8 == 0

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if fused_here:
                (num, den, correct), new_bn = model.fused_train_loss(
                    variables, points, labels, class_weights,
                    dropout_key=dropout_key,
                )
                acc_pair = (correct, jnp.sum(masks.astype(jnp.float32)))
            else:
                logits, new_bn = model.apply(
                    variables,
                    points,
                    train=True,
                    mask=masks,
                    dropout_key=dropout_key,
                    axis_name=bn_axis,
                )
                # Per-shard weighted CE as (numerator, weight-sum) so the
                # GLOBAL loss (= reference's single-device loss) is
                # psum(num)/psum(den), not a mean of shard means.
                num, den = cross_entropy_sums(logits, labels, class_weights)
                acc_pair = masked_accuracy(logits, labels, masks)
            gnum = jax.lax.psum(num, DATA_AXIS)
            gden = jnp.maximum(
                jax.lax.psum(den, DATA_AXIS), jnp.finfo(jnp.float32).tiny
            )
            loss = gnum / gden
            return loss, (acc_pair, new_bn)

        # Under shard_map's VMA type system (check_vma=True), the gradient
        # of a psum-reduced (replicated) loss w.r.t. replicated params comes
        # back ALREADY psum-reduced across the data axis — JAX inserts the
        # allreduce at the psum transpose. No manual gradient psum (it
        # would multiply grads by the axis size).
        (loss, (acc_pair, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # Capacity-overflow counts ride the aux dict under a reserved key
        # (sparse family: occupied sites/tiles beyond the static capacity,
        # whose points silently read zero logits). Pop BEFORE the replica-0
        # batch-stats selection — overflow must SUM across replicas.
        overflow = (
            new_bn.pop("__overflow__", None)
            if isinstance(new_bn, dict) else None
        )
        # Exception: gradients that flowed through an opaque custom-VJP
        # (the fused Pallas blocks) come back as per-shard partials typed
        # varying-over-data; psum exactly those. Replicated leaves (the
        # plain XLA path) pass through untouched.
        grads = jax.tree.map(
            lambda g: (
                jax.lax.psum(g, DATA_AXIS)
                if DATA_AXIS in getattr(jax.typeof(g), "vma", frozenset())
                else g
            ),
            grads,
        )

        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: (-lr) * u, updates)
        )

        # Canonical running stats: keep replica 0's update (DataParallel
        # keeps only the original module's buffers — pcs.py:209-213). The
        # masked psum broadcasts replica 0's value, making the result
        # replicated under the VMA type system. With sync_batchnorm the
        # per-replica updates are already identical, so this is a no-op
        # semantically either way.
        is_r0 = (jax.lax.axis_index(DATA_AXIS) == 0).astype(jnp.float32)
        new_bn = jax.tree.map(
            lambda s: jax.lax.psum(s * is_r0, DATA_AXIS), new_bn
        )

        correct, total = acc_pair
        metrics = {
            "loss": loss,
            "correct": jax.lax.psum(correct, DATA_AXIS),
            "total": jax.lax.psum(total, DATA_AXIS),
        }
        if overflow is not None:
            metrics["dropped"] = jax.lax.psum(
                jnp.sum(overflow.astype(jnp.int32)), DATA_AXIS
            )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bn,
            opt_state=new_opt,
        )
        return new_state, metrics

    rep = P()
    shd = P(DATA_AXIS)
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, (shd, shd, shd), rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=True,
    )


def make_train_step(
    model: PointNetSeg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    sync_batchnorm: bool = False,
    donate: bool = True,
):
    """Build the compiled train step.

    Signature: ``train_step(state, batch, lr, dropout_key, class_weights)
    -> (new_state, metrics)`` where batch = (points (B,M,D), labels (B,M),
    masks (B,M)) with B divisible by the mesh data axis, class_weights is
    a (C,) f32 array (pass ones for unweighted CE), and metrics =
    {loss, correct, total} global scalars (loss = global weighted CE, the
    same number DataParallel's gathered loss produces).

    ``class_weights`` is a RUN-TIME argument, not a captured constant: on
    some PJRT runtimes a jit-closure array constant forces a pathological
    dispatch path (~40x step cost); an explicit argument always takes the
    fast path and costs nothing extra.
    """
    mapped = _make_mapped_train_step(
        model, optimizer, mesh, sync_batchnorm=sync_batchnorm
    )
    if donate:
        return jax.jit(mapped, donate_argnums=(0,))
    return jax.jit(mapped)


def make_scan_train_steps(
    model: PointNetSeg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    sync_batchnorm: bool = False,
):
    """Many train steps in ONE dispatch: ``lax.scan`` over pre-staged
    batches.

    Measured note: with donated state, JAX's async dispatch already
    pipelines the per-step loop, so on this hardware the scan is NOT
    faster (34.8 vs 30.5 ms/step at K=25). It exists for callers who need
    a single program per epoch (e.g. to minimize host wakeups or to stage
    an epoch entirely on device for multi-host orchestration).

    Signature: ``run(state, batches, lr, keys, class_weights) ->
    (new_state, stacked_metrics)`` where batches = (points (K,B,M,D),
    labels (K,B,M), masks (K,B,M)) and keys is a stacked (K,) key array.
    All K batches must share one bucket shape.
    """
    mapped = _make_mapped_train_step(
        model, optimizer, mesh, sync_batchnorm=sync_batchnorm
    )

    def run(state, batches, lr, keys, class_weights):
        def body(state, xs):
            batch, key = xs
            state, metrics = mapped(state, batch, lr, key, class_weights)
            return state, metrics

        return jax.lax.scan(body, state, (batches, keys))

    return jax.jit(run, donate_argnums=(0,))


def make_eval_step(
    model: PointNetSeg,
    mesh: Mesh,
    num_classes: int,
):
    """Build the compiled eval step.

    Signature: ``eval_step(state, batch, class_weights) -> metrics`` with
    {loss, correct, total, confusion (C,C)} — loss/accuracy as the
    reference's val pass (pcs.py:276-312) plus the confusion matrix that
    replaces its third F1 sweep (pcs.py:314-346). ``class_weights`` is a
    runtime (C,) array for the same reason as in make_train_step.
    """

    def step(state: TrainState, batch, class_weights):
        points, labels, masks = batch
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        surfaces_overflow = hasattr(model, "overflow_counts")
        if surfaces_overflow:
            # sparse family: the forward already counted capacity
            # exhaustion — return it instead of re-voxelizing for it
            logits, dropped = model.apply(
                variables, points, train=False, mask=masks,
                return_overflow=True,
            )
        else:
            logits = model.apply(variables, points, train=False, mask=masks)
        lnum, lden = cross_entropy_sums(logits, labels, class_weights)
        num = jax.lax.psum(lnum, DATA_AXIS)
        den = jnp.maximum(
            jax.lax.psum(lden, DATA_AXIS), jnp.finfo(jnp.float32).tiny
        )
        correct, total = masked_accuracy(logits, labels, masks)
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(pred, labels, masks, num_classes)
        metrics = {
            "loss": num / den,
            "correct": jax.lax.psum(correct, DATA_AXIS),
            "total": jax.lax.psum(total, DATA_AXIS),
            "confusion": jax.lax.psum(cm, DATA_AXIS),
        }
        if surfaces_overflow:
            # sparse family: surface capacity exhaustion in eval too
            metrics["dropped"] = jax.lax.psum(
                jnp.sum(dropped), DATA_AXIS
            )
        return metrics

    rep = P()
    shd = P(DATA_AXIS)
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, (shd, shd, shd), rep),
        out_specs=rep,
        check_vma=True,
    )
    return jax.jit(mapped)
