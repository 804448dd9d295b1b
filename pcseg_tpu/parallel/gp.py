"""Grid-parallel voxel U-Net — the depth (z) axis of the voxel grid
sharded across the mesh ``model`` axis.

The voxel-family analog of sequence/context parallelism (SURVEY.md §5:
"for very large events, shard the point/voxel axis across the mesh and
implement the reductions with psum-style cross-chip collectives"): each
chip holds a D/P-slab of the grid, so U-Net activation memory scales 1/P
per chip — the mechanism that takes 256^3+ grids past a single chip's
HBM. Collectives, all riding ICI:

- every 3^3 conv exchanges ONE boundary slab with each depth neighbor
  (``lax.ppermute``; the halo is concatenated, the conv runs SAME on the
  extended slab, and the two edge outputs are discarded — numerics
  identical to the unsharded conv);
- GroupNorm statistics psum over the depth shards (``_gp_group_norm``);
- the stride-2 down/up convs and the 1x1 head are depth-local (non-
  overlapping k=2 windows never cross an even shard boundary);
- the classifier grid is all-gathered for the per-point readout
  (logits are C=num_classes wide — the gather is tiny next to the
  feature grids that stay sharded).

Both conv cores run depth-sharded: the XLA core (halo-concat around
each conv3d) and the lane-packed Pallas core (halo-concat on the PACKED
view around each fused_conv3x3_p; the two discarded edge outputs make
the kernel's zero-boundary handling exact, and the concat/slice
transposes give correct halo gradients for free). GroupNorm stats for
the fused path are psum'd lane sums (stats_scale_shift). Off-TPU the
shard_map runs with check_vma=False: JAX's pallas HLO interpreter cannot
evaluate kernels whose operands are vma-typed — tracking and transpose
semantics are unchanged, only the per-primitive check relaxes.

Reference counterpart: none (DataParallel only, pcs.py:209-213); this is
a scaling capability the reference lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pcseg_tpu.models.voxel_unet import VoxelUNet3d
from pcseg_tpu.ops.conv3d import conv3d, conv3d_transpose
from pcseg_tpu.ops.voxel import devoxelize_trilinear, voxelize
from pcseg_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _resolve_core(model: VoxelUNet3d):
    impl = model.conv_impl
    if impl == "auto":
        impl = "fused" if (
            jnp.dtype(model.compute_dtype) == jnp.bfloat16
            and model._fused_ok()
        ) else "xla"
    return _gp_core_fused if impl == "fused" else _gp_core


def _halo_exchange(x: jax.Array, axis: str) -> tuple[jax.Array, jax.Array]:
    """Neighbor boundary slabs along the sharded depth axis.

    x: (B, Dl, H, W, C) local slab. Returns (lo, hi), each (B, 1, ...):
    lo = previous shard's last slice, hi = next shard's first slice;
    zeros at the global volume edges (ppermute leaves non-destination
    outputs zero).
    """
    n = jax.lax.axis_size(axis)
    fwd = [(s, s + 1) for s in range(n - 1)]
    bwd = [(s + 1, s) for s in range(n - 1)]
    lo = jax.lax.ppermute(x[:, -1:], axis, fwd)
    hi = jax.lax.ppermute(x[:, :1], axis, bwd)
    return lo, hi


def _gp_group_norm(p, x, axis, groups: int = 8, eps: float = 1e-5):
    """GroupNorm with statistics psum'd over the depth shards — exactly
    ops/conv3d.py group_norm on the logically-unsharded grid."""
    b, d, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    xf = x.astype(jnp.float32).reshape(b, d * h * w, g, c // g)
    s1 = jax.lax.psum(jnp.sum(xf, axis=(1, 3)), axis)
    s2 = jax.lax.psum(jnp.sum(jnp.square(xf), axis=(1, 3)), axis)
    # equal-sized shards: the global count is static
    n = d * h * w * (c // g) * jax.lax.axis_size(axis)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    y = (xf - mean[:, None, :, None]) * jax.lax.rsqrt(
        var[:, None, :, None] + eps
    )
    y = y.reshape(b, d, h, w, c) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _gp_core(model: VoxelUNet3d, p, x, axis: str):
    """The XLA U-Net core on a depth-sharded grid (see _unet_core)."""
    dt = jnp.dtype(model.compute_dtype)

    def conv_halo(name, x):
        lo, hi = _halo_exchange(x, axis)
        ext = jnp.concatenate([lo.astype(dt), x, hi.astype(dt)], axis=1)
        return conv3d(p[name], ext, compute_dtype=dt)[:, 1:-1]

    def block(name, x, stride=1, transpose=False):
        if transpose:
            y = conv3d_transpose(p[name], x, stride=stride, compute_dtype=dt)
        elif stride == 2:
            y = conv3d(p[name], x, stride=2, compute_dtype=dt)
        else:
            y = conv_halo(name, x)
        y = _gp_group_norm(p[f"{name}_gn"], y, axis)
        return jnp.maximum(y, 0.0).astype(dt)

    x = block("stem", x)
    skips = []
    for i in range(model.levels):
        x = block(f"enc{i}_a", x)
        x = block(f"enc{i}_b", x)
        if i < model.levels - 1:
            skips.append(x)
            x = block(f"down{i}", x, stride=2)
    for i in range(model.levels - 2, -1, -1):
        x = block(f"up{i}", x, stride=2, transpose=True)
        x = jnp.concatenate([x, skips[i].astype(dt)], axis=-1)
        x = block(f"dec{i}_a", x)
        x = block(f"dec{i}_b", x)
    return conv3d(p["head"], x, compute_dtype=dt).astype(jnp.float32)


def _gp_core_fused(model: VoxelUNet3d, p, x, axis: str):
    """The lane-packed Pallas U-Net core on a depth-sharded grid.

    Mirror of models/voxel_unet.py _unet_core_fused with: (a) each 3^3
    conv wrapped in a packed halo-concat (one ppermuted slab per
    neighbor; SAME conv on the extended slab; edge outputs dropped), and
    (b) GroupNorm lane-stat sums psum'd over the shards. The stride-2
    down/up matmuls and the head stay depth-local. Stats come from the
    conv kernels' epilogues with ``stats_skip_edges`` masking out the
    dropped halo slabs (r3 — previously each conv took a separate
    packed_stats HBM pass over its output). Decoder skip-merge is the
    same concat-free add-fused kernel as the unsharded core, run on the
    extended slabs with the edge outputs dropped after.
    """
    from pcseg_tpu.ops.pallas.conv3d_block import (
        act_packed,
        down2x_packed,
        fused_conv3x3_add_p,
        fused_conv3x3_p,
        head1x1_packed,
        pack_grid,
        stats_scale_shift,
        up2x_packed,
    )

    dt = jnp.bfloat16
    groups = 8
    widths = [model.width * (2 ** i) for i in range(model.levels)]
    rs = [model.grid_size // (2 ** i) for i in range(model.levels)]
    nsh = jax.lax.axis_size(axis)

    def fold(st, gn_name, lv):
        gn = p[gn_name]
        # stats are per-shard lane sums over the LOCAL slab; psum makes
        # them the global-grid statistics
        st = jax.lax.psum(st, axis)
        return stats_scale_shift(
            st, gn["scale"], gn["bias"], groups, rs[lv] ** 3
        )

    def conv_ext(xp, sc, sh, activate=True):
        # activate BEFORE the exchange: the volume-edge halos are zeros,
        # and the unsharded kernel's boundary semantics are
        # post-activation zeros (relu(0*scale + shift) is not 0) — so
        # the kernels run prologue-free on pre-activated slabs here
        a = act_packed(xp, sc, sh) if activate else xp
        lo, hi = _halo_exchange(a, axis)
        return jnp.concatenate([lo, a, hi], axis=1)

    def conv_halo(xp, kernel, bias, sc, sh, meta, activate=True,
                  want_stats=True):
        ext = conv_ext(xp, sc, sh, activate)
        out = fused_conv3x3_p(ext, kernel, bias, zeros, zeros, meta, False,
                              want_stats, None, want_stats)
        if want_stats:
            return out[0][:, 1:-1], out[1]
        return out[:, 1:-1]

    cin = x.shape[-1]
    w0 = widths[0]
    b = x.shape[0]
    xp, meta = pack_grid(
        jnp.pad(x.astype(dt), ((0, 0),) * 4 + ((0, w0 - cin),))
    )
    kstem = jnp.zeros((3, 3, 3, w0, w0), jnp.float32)
    kstem = kstem.at[..., :cin, :].set(p["stem"]["kernel"])
    zeros = jnp.zeros((b, 128), jnp.float32)
    xp, st = conv_halo(xp, kstem, p["stem"]["bias"], None, None, meta,
                       activate=False)
    sc, sh = fold(st, "stem_gn", 0)
    skips = []
    for i in range(model.levels):
        xp, st = conv_halo(xp, p[f"enc{i}_a"]["kernel"],
                           p[f"enc{i}_a"]["bias"], sc, sh, meta)
        sc, sh = fold(st, f"enc{i}_a_gn", i)
        xp, st = conv_halo(xp, p[f"enc{i}_b"]["kernel"],
                           p[f"enc{i}_b"]["bias"], sc, sh, meta)
        sc, sh = fold(st, f"enc{i}_b_gn", i)
        if i < model.levels - 1:
            skips.append((xp, sc, sh, meta))
            xp, meta, st = down2x_packed(
                act_packed(xp, sc, sh),
                p[f"down{i}"]["kernel"], p[f"down{i}"]["bias"], meta,
                want_stats=True,
            )
            sc, sh = fold(st, f"down{i}_gn", i + 1)
    for i in range(model.levels - 2, -1, -1):
        wi = widths[i]
        up_p, meta, st_u = up2x_packed(
            act_packed(xp, sc, sh),
            p[f"up{i}"]["kernel"], p[f"up{i}"]["bias"], meta,
            want_stats=True,
        )
        sc_u, sh_u = fold(st_u, f"up{i}_gn", i)
        skip_p, sc_s, sh_s, meta = skips[i]
        wk = p[f"dec{i}_a"]["kernel"]
        bias_a = p[f"dec{i}_a"]["bias"]
        # same concat-free skip merge as the unsharded core: the first
        # half-kernel conv stays extended (its edge slabs are garbage but
        # dropped below), the second adds it in-kernel and accumulates
        # interior-only stats
        y1e = fused_conv3x3_p(
            conv_ext(up_p, sc_u, sh_u), wk[:, :, :, :wi],
            jnp.zeros_like(bias_a), zeros, zeros, meta, False, False,
        )
        y2e, st = fused_conv3x3_add_p(
            conv_ext(skip_p, sc_s, sh_s), y1e, wk[:, :, :, wi:], bias_a,
            zeros, zeros, meta, False, None, True,
        )
        xp = y2e[:, 1:-1]
        sc, sh = fold(st, f"dec{i}_a_gn", i)
        xp, st = conv_halo(xp, p[f"dec{i}_b"]["kernel"],
                           p[f"dec{i}_b"]["bias"], sc, sh, meta)
        sc, sh = fold(st, f"dec{i}_b_gn", i)
    del nsh
    return head1x1_packed(
        act_packed(xp, sc, sh), p["head"]["kernel"], p["head"]["bias"],
        meta, model.num_classes,
    )


def _check_shardable(model: VoxelUNet3d, n: int) -> None:
    r = model.grid_size
    if (r // (2 ** (model.levels - 1))) % n:
        raise ValueError(
            f"grid {r} with {model.levels} levels cannot shard depth over "
            f"{n} devices (deepest level must still split evenly)"
        )


def _gp_apply(model: VoxelUNet3d, p, points, mask, axis: str, n: int,
              core=None):
    """Depth-sharded forward body (runs inside shard_map): replicated
    points in, replicated per-point logits out."""
    if core is None:
        core = _resolve_core(model)
    r = model.grid_size
    grid = voxelize(
        points, mask, r,
        impl=getattr(model, "voxelize_impl", "auto"),
        matmul_dtype=jnp.dtype(model.compute_dtype),
    )
    dl = r // n
    idx = jax.lax.axis_index(axis)
    x_local = jax.lax.dynamic_slice_in_dim(
        grid.features, idx * dl, dl, axis=1
    )
    core_fn = lambda p_, x_: core(model, p_, x_, axis)  # noqa: E731
    if model.remat:
        # same remat semantics as the unsharded model (voxel_unet.py:135):
        # the backward replays the core (halo ppermutes included) instead
        # of keeping every slab activation resident
        core_fn = jax.checkpoint(core_fn)
    logits_local = core_fn(
        p, x_local.astype(jnp.dtype(model.compute_dtype))
    )
    # gather the classifier grid as place-and-psum: every shard writes
    # its slab into a zero full grid and the psum assembles it —
    # numerically an all_gather, but the result is replicated
    # (vma-invariant) by construction
    full = jnp.zeros(
        logits_local.shape[:1] + (r,) + logits_local.shape[2:],
        logits_local.dtype,
    )
    full = jax.lax.dynamic_update_slice_in_dim(
        full, logits_local, idx * dl, axis=1
    )
    logits_full = jax.lax.psum(full, axis)
    return devoxelize_trilinear(
        logits_full, points, mask, grid.lo, grid.scale,
        bwd_dtype=jnp.dtype(model.compute_dtype),
    )


def make_gp_forward(
    model: VoxelUNet3d,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
):
    """Jitted eval forward with the batch sharded over ``data_axis`` and
    the voxel grid depth-sharded over ``axis``.
    ``f(variables, points, mask) -> logits (B, M, C)``.

    Params stay replicated; voxelize runs per data-shard and each depth
    shard keeps its D/P slab. The mesh ``axis`` size must divide
    ``model.grid_size / 2^(levels-1)``; the batch must divide the
    ``data_axis`` size (pass ``data_axis=None`` to replicate it).
    """
    n = mesh.shape[axis]
    _check_shardable(model, n)
    core = _resolve_core(model)
    # JAX's pallas HLO interpreter (off-TPU) cannot evaluate vma-typed
    # operands; forward values don't depend on vma typing, so relax the
    # check for the fused core there
    check = core is _gp_core or jax.default_backend() == "tpu"

    def fwd(variables, points, mask):
        return _gp_apply(model, variables["params"], points, mask, axis, n,
                         core)

    bspec = P(data_axis) if data_axis else P()
    mapped = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), bspec, bspec),
        out_specs=bspec,
        check_vma=check,
    )
    return jax.jit(mapped)


def make_gp_eval_step(
    model: VoxelUNet3d,
    mesh: Mesh,
    num_classes: int,
    axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
):
    """Eval step whose forward runs depth-sharded (the point of GP: a
    grid too big for one chip must ALSO evaluate sharded — the epoch
    loop previously validated through the replicated-grid DP step, which
    would OOM exactly where GP training fits; VERDICT r3 item 2).

    Same signature/metrics as train.steps.make_eval_step:
    ``eval_step(state, batch, class_weights) -> {loss, correct, total,
    confusion}``. The reference runs inference under the same parallelism
    as training (pcs.py:412-420); this is that property for GP.
    """
    from pcseg_tpu.ops.losses import cross_entropy_sums
    from pcseg_tpu.ops.metrics import confusion_matrix, masked_accuracy

    n = mesh.shape[axis]
    _check_shardable(model, n)
    core = _resolve_core(model)
    # eval has no gradient transposes, so the off-TPU pallas-interpreter
    # restriction only needs check_vma relaxed (same as make_gp_forward)
    check = core is _gp_core or jax.default_backend() == "tpu"

    def step(state, batch, class_weights):
        points, labels, masks = batch
        logits = _gp_apply(model, state.params, points, masks, axis, n,
                           core)
        num, den = cross_entropy_sums(logits, labels, class_weights)
        correct, total = masked_accuracy(logits, labels, masks)
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(pred, labels, masks, num_classes)
        if data_axis:
            num = jax.lax.psum(num, data_axis)
            den = jax.lax.psum(den, data_axis)
            correct = jax.lax.psum(correct, data_axis)
            total = jax.lax.psum(total, data_axis)
            cm = jax.lax.psum(cm, data_axis)
        return {
            "loss": num / jnp.maximum(den, jnp.finfo(jnp.float32).tiny),
            "correct": correct,
            "total": total,
            "confusion": cm,
        }

    rep = P()
    bspec = P(data_axis) if data_axis else rep
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, (bspec, bspec, bspec), rep),
        out_specs=rep,
        check_vma=check,
    )
    return jax.jit(mapped)


def make_gp_train_step(
    model: VoxelUNet3d,
    mesh: Mesh,
    optimizer,
    axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
    donate: bool = False,
):
    """Training step over the depth-sharded U-Net, composed with DP.

    Same signature as train.steps.make_train_step: ``step(state, batch,
    lr, dropout_key, class_weights) -> (state, metrics)``. The batch is
    sharded over the mesh ``data_axis`` while each replica's voxel grid
    is depth-sharded over ``axis`` — the actual v5e-8 topology for big
    grids (e.g. data=4 x model=2: 4-way batch parallelism, each sample's
    256^3 grid split over 2 chips). ``data_axis=None`` replicates the
    batch (pure GP).

    Collectives: the loss is psum(num)/psum(den) over ``data_axis`` (the
    same global weighted CE as the DP step, train/steps.py:95-100); the
    gradient collectives are the autodiff transposes of the halo
    ppermutes / stat psums plus a psum over every axis a leaf comes back
    varying on (depth, data, or both).
    """
    import optax

    from pcseg_tpu.ops.losses import cross_entropy_sums
    from pcseg_tpu.ops.metrics import masked_accuracy
    from pcseg_tpu.train.steps import TrainState

    n = mesh.shape[axis]
    _check_shardable(model, n)
    core = _resolve_core(model)
    if core is _gp_core_fused and jax.default_backend() != "tpu":
        # training needs check_vma=True (the psum/ppermute TRANSPOSES
        # carry the gradient collectives), and the off-TPU pallas
        # interpreter can't run under it — use the XLA core off-TPU
        core = _gp_core
    axes = (data_axis, axis) if data_axis else (axis,)

    def _psum_varying(g):
        vma = getattr(jax.typeof(g), "vma", frozenset())
        over = tuple(a for a in axes if a in vma)
        return jax.lax.psum(g, over) if over else g

    def step(state, batch, lr, dropout_key, class_weights):
        points, labels, masks = batch

        def loss_fn(params):
            logits = _gp_apply(model, params, points, mask=masks,
                               axis=axis, n=n, core=core)
            num, den = cross_entropy_sums(logits, labels, class_weights)
            if data_axis:
                num = jax.lax.psum(num, data_axis)
                den = jax.lax.psum(den, data_axis)
            return num / jnp.maximum(den, jnp.finfo(jnp.float32).tiny), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.tree.map(_psum_varying, grads)
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: (-lr) * u, updates)
        )
        correct, total = masked_accuracy(logits, labels, masks)
        if data_axis:
            correct = jax.lax.psum(correct, data_axis)
            total = jax.lax.psum(total, data_axis)
        metrics = {"loss": loss, "correct": correct, "total": total}
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=state.batch_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    rep = P()
    bspec = P(data_axis) if data_axis else rep
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, (bspec, bspec, bspec), rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=True,
    )
    if donate:
        return jax.jit(mapped, donate_argnums=(0,))
    return jax.jit(mapped)
