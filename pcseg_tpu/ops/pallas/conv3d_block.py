"""Fused 3x3x3 conv block for the voxel U-Net — lane-packed block matmuls.

Why: XLA's conv_general_dilated at U-Net widths (C=16..64, channels-last)
runs ~20x off roofline on TPU (measured 4.0 ms vs ~0.2 ms compute /
~0.4 ms HBM floor at B8 x 64^3 x 16ch — experiments/bench_conv3d_variants).
The pathology is lane utilization: C=16 arrays fill 16 of 128 vector
lanes and the implicit GEMM has N=16.

Design (TPU-first, no reference counterpart — the reference's model is a
PointNet; this serves the north-star voxel U-Net, BASELINE.json configs
2/3):

- View the NDHWC grid as ``(B, D, H*U, 128)`` where ``U = W / P`` and
  ``P = 128 / C`` positions are packed per 128-lane block. This is a
  contiguous reinterpretation — zero data movement, zero lane padding.
- The 3^3 conv then decomposes into
    * 9 "main" matmuls — for each (dz, dy) tap, the row-shifted slab
      times a (128, 128) block-banded weight covering dx in {-1, 0, +1}
      WITHIN the lane block (full MXU K/N utilization), plus
    * 1 compact "edge" matmul — a (rows, 9*2C) patch of the C-lane
      columns that cross the 8-position block boundary, times a
      (9*2C, 128) weight.
  FLOP inflation vs the dense conv is (9*128 + 9*2C) * 128 /
  (27 * C * C) = 2.7x at C=16 (less at wider C), repaying itself ~8x
  in MXU utilization.
- The per-element ``relu(x * scale + shift)`` PROLOGUE (the folded
  GroupNorm of the previous layer) is applied on the fly when slabs are
  read, so normalization/activation never round-trips HBM.
- dz = ±1 slabs arrive as two extra views of the same input array with
  shifted-and-clamped index maps; boundary validity is a scalar mask.

STAY PACKED between layers. XLA lays narrow-C NDHWC grids out with W in
the 128-lane minor position (C=16 would waste 7/8 of each lane tile), so
every hand-off between an XLA op and a Pallas custom call (which requires
the default C-minor layout) is a full relayout copy — profiling the round-1
fused U-Net core showed 41 such 67-134 MB copies per train step dominating
the profile. The packed ``(B, D, H*U, 128)`` form has an unambiguous
minor-128 layout, so the packed-level API below (``fused_conv3x3_p`` etc.)
threads activations through the whole U-Net core with relayouts only at
the few true XLA boundaries (stem / strided down / transposed up / head).
For the same reason the GroupNorm statistics are accumulated INSIDE the
forward kernel (per-lane sum/sumsq epilogue, f32) instead of by an XLA
reduce over an f32 copy of the grid.

The custom VJP is hand-written Pallas too: dgrad reuses the forward
kernel structure with flipped-tap/IO-transposed packed weights on the
upstream gradient (with the relu'/scale epilogue and per-lane
dscale/dshift reductions fused in), and wgrad accumulates per-tap
(128, rows) @ (rows, 128) contractions across the whole (b, d) grid into
one VMEM-resident block before an XLA unpack folds the banded copies
back to (3, 3, 3, C, C). Kernels process a rolling window of kd
consecutive d-slices with two clamped 1-slab halos, cutting dz-neighbor
re-reads from 3x to 1 + 2/kd. Measured at B8 x 64^3 x 16ch bf16: fwd
~1.2-1.5 ms (XLA conv 4.0), fwd+bwd all-grads 3.0 ms (XLA 13.0); the
full U-Net core f+b runs 23.0 ms vs 95.1 for the XLA core
(experiments/bench_unet_all.py, BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ---------------------------------------------------------------------------
# packing helpers
# ---------------------------------------------------------------------------

def pack_grid(x: jax.Array) -> tuple[jax.Array, tuple[int, int, int]]:
    """(B, D, H, W, C) -> packed (B, D, H*U, 128) view + (h, u, c) meta.

    Contiguous reinterpretation: lane = (w % P) * C + c with P = 128/C.
    """
    b, d, h, w, c = x.shape
    if LANES % c or w % (LANES // c):
        raise ValueError(f"C={c} must divide 128 and W={w} must be a "
                         f"multiple of 128/C")
    u = w // (LANES // c)
    return x.reshape(b, d, h * u, LANES), (h, u, c)


def unpack_grid(xp: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """Inverse of pack_grid."""
    b, d = xp.shape[:2]
    return xp.reshape(b, d, h, w, c)


# ---------------------------------------------------------------------------
# weight packing (differentiable jnp so grads flow to the raw (3,3,3,C,C) w)
# ---------------------------------------------------------------------------

def _placement(p: int) -> jnp.ndarray:
    """(3, P, P) binary: M[dx+1, i, j] = 1 iff input pos i feeds output
    pos j within the lane block, i.e. j == i - dx."""
    import numpy as np

    m = np.zeros((3, p, p), np.float32)
    for dx in (-1, 0, 1):
        for i in range(p):
            j = i - dx
            if 0 <= j < p:
                m[dx + 1, i, j] = 1.0
    return jnp.asarray(m)


def pack_weights(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """w: (3, 3, 3, C, C) DHWIO -> (wm (9*128, 128), we (9*2C, 128))."""
    c = w.shape[-1]
    p = LANES // c
    w9 = w.reshape(9, 3, c, c)                     # (tap, dx, ci, co)
    m = _placement(p)                              # (dx, i, j)
    wm = jnp.einsum("xij,txab->tiajb", m, w9)      # (9, P, C, P, C)
    wm = wm.reshape(9 * LANES, LANES)
    # edges: side 0 = input i=P-1 of block u-1 feeds output j=0 (dx=-1);
    #        side 1 = input i=0   of block u+1 feeds output j=P-1 (dx=+1)
    we = jnp.zeros((9, 2, c, p, c), w.dtype)
    we = we.at[:, 0, :, 0, :].set(w9[:, 0])
    we = we.at[:, 1, :, p - 1, :].set(w9[:, 2])
    return wm, we.reshape(9 * 2 * c, LANES)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _interp(flag) -> bool:
    "'None -> auto: interpret off-TPU (CPU tests), compiled on TPU.'"
    return jax.default_backend() != "tpu" if flag is None else bool(flag)


def _shift_rows(slab: jax.Array, k: int) -> jax.Array:
    """out[r] = slab[r + k], zero-padded at the ends (static k)."""
    if k == 0:
        return slab
    rows = slab.shape[0]
    z = jnp.zeros((abs(k), slab.shape[1]), slab.dtype)
    if k > 0:
        return jnp.concatenate([slab[k:], z], axis=0)
    return jnp.concatenate([z, slab[:k]], axis=0)


def _prep_slab(slab, scale_ref, shift_ref, activate, valid=None):
    """Folded-GN prologue on one (rows, 128) slab; `valid` zeroes
    out-of-range d boundaries."""
    s = slab.astype(jnp.float32)
    if activate:
        s = jnp.maximum(s * scale_ref[0, 0] + shift_ref[0, 0], 0.0)
    if valid is not None:
        s = s * valid
    return s.astype(jnp.bfloat16)


def _window_prep_fn(xm_ref, x0_ref, xp_ref, scale_ref, shift_ref, activate,
                    kd, u, c, adj=None):
    """Activated-slab accessor for the kd-slice window + two 1-slab halos.

    Each program covers d in [j*kd, (j+1)*kd); halos are clamped reads
    masked to zero at the volume boundaries. Reading kd slices + 2 halos
    per program puts the read amplification at 1 + 2/kd instead of the
    3x of the one-slice-per-program formulation.

    Returns prep(i) mapping window index i (0 = prev halo, 1..kd = the
    kd cur slices, kd+1 = next halo) to its (activated slab, edge panel)
    pair. Callers emit prep lazily — only the 3 slabs slice 0 needs up
    front, then the one new slab per slice BEFORE that slice's matmuls —
    so the VPU prologue of slice k+1 overlaps slice k's MXU work instead
    of the whole window prep serializing ahead of the first matmul (same
    overlap trick as the half-split fused_block tiles).

    ``adj`` = (ym_ref, y0_ref, yp2_ref, gs1_ref, gs2_ref, skip_edges)
    folds the GroupNorm-stats cotangent broadcast ``x + gs1 + 2*gs2*y``
    into the slab read (the backward kernels' gy windows) instead of a
    standalone XLA pass over the packed array — the y refs share the
    x refs' halo specs. With ``skip_edges`` the broadcast skips the
    first/last global d slab (grid-parallel edge-drop callers)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    one = jnp.float32(1.0)

    def apply_adj(raw, y, dg):
        ym_, y0_, yp2_, gs1_ref, gs2_ref, skip_edges = adj
        t = (gs1_ref[0, 0]
             + 2.0 * gs2_ref[0, 0] * y.astype(jnp.float32))
        if skip_edges:
            t = t * jnp.where((dg > 0) & (dg < nj * kd - 1), one, 0.0)
        return raw.astype(jnp.float32) + t

    def prep(i):
        if i == 0:
            raw = xm_ref[0, 0]
            if adj is not None:
                raw = apply_adj(raw, adj[0][0, 0],
                                jnp.maximum(j * kd - 1, 0))
            s = _prep_slab(raw, scale_ref, shift_ref, activate,
                           jnp.where(j > 0, one, 0.0))
        elif i <= kd:
            raw = x0_ref[0, i - 1]
            if adj is not None:
                raw = apply_adj(raw, adj[1][0, i - 1], j * kd + i - 1)
            s = _prep_slab(raw, scale_ref, shift_ref, activate)
        else:
            raw = xp_ref[0, 0]
            if adj is not None:
                raw = apply_adj(raw, adj[2][0, 0],
                                jnp.minimum(j * kd + kd, nj * kd - 1))
            s = _prep_slab(raw, scale_ref, shift_ref, activate,
                           jnp.where(j < nj - 1, one, 0.0))
        return s, _edge_panel(s, u, c)

    return prep


# Scoped-VMEM ceiling granted to the conv kernels. Mosaic's default limit
# (~16M) pinned rows=2048 (128^3 at w16) to kd=1 — 3x slab re-reads; the
# v5e core has 128 MiB of VMEM, and raising the grant lets the big-rows
# rungs take kd>=2 while leaving pipelining headroom (r3 sweep:
# experiments/bench_kd_vmem.py).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _pick_kd(d: int, rows: int, has_accum: bool = False) -> int:
    """Depth-window size: amortize halo reads, bounded by VMEM. Cost ~
    a*(kd*rows) + b*rows (window/output blocks plus per-slab halos and
    f32 prologue transients). Under the default ~16M scoped limit the
    rows=2048 rung OOMed at kd=2 (21.8M); with the raised
    `_VMEM_LIMIT_BYTES` grant the ladder below combines the per-rung
    winners of the r3 device sweep (experiments/bench_kd_vmem.py:
    128^3/w16 U-Net core f+b 32.6 -> 21.9 ms, 64^3 22.0 -> 20.6)."""
    if rows <= 512:
        kd = 16 if has_accum else 32
    elif rows <= 1024:
        kd = 8
    else:
        kd = 4 if has_accum else 8
    while kd > 1 and d % kd:
        kd //= 2
    return kd


def _edge_panel(slab, u: int, c: int):
    """(rows, 6C) panel of the C-lane columns crossing the lane-block
    boundary: one (left, right) chunk pair per dy in (-1, 0, 1).

    Built ONCE per activated slab. The anatomy bench
    (experiments/bench_conv3d_anatomy.py) showed the per-slice 18-chunk
    patch build was ~35% of the whole forward kernel — every slab's
    chunks were rebuilt three times (once per prev/cur/next role).
    Consumers matmul the panel against the contiguous 6C-row block of
    the edge weight for that dz tap (same row order as pack_weights:
    (dz*3 + dy) * 2C + side*C).

    The shifts stay on the full 128-lane slab (column slice after):
    row-shifting the narrow (rows, C) panels instead would be less data
    movement but lowers to a sublane-offset `tpu.concatenate` Mosaic
    rejects ("result/input offset mismatch on non-concat dimension")."""
    rows = slab.shape[0]
    uid = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0) % u
    chunks = []
    for dy in (-1, 0, 1):
        left = _shift_rows(slab, dy * u - 1)[:, LANES - c :]
        chunks.append(jnp.where(uid == 0, 0.0, left))
        right = _shift_rows(slab, dy * u + 1)[:, :c]
        chunks.append(jnp.where(uid == u - 1, 0.0, right))
    return jnp.concatenate(chunks, axis=1)


def _conv_core(pairs, wm_ref, we_ref, u: int, c: int):
    """9 per-tap banded matmuls + 3 per-slab edge matmuls -> f32
    (rows, 128). ``pairs``: three (slab, edge_panel) tuples.

    (A single deep (rows, 1152) @ (1152, 128) matmul of the concatenated
    taps measured the same at the core level and adds a large VMEM
    transient — the per-tap accumulation chain pipelines fine.) Each
    slab's precomputed (rows, 6C) edge panel multiplies the contiguous
    6C-row block of the edge weight for its dz position."""
    rows = pairs[0][0].shape[0]
    acc = jnp.zeros((rows, LANES), jnp.float32)
    for dz, (slab, panel) in enumerate(pairs):
        acc = acc + jnp.dot(
            panel, we_ref[dz * 6 * c : (dz + 1) * 6 * c],
            preferred_element_type=jnp.float32,
        )
        for dy in (-1, 0, 1):
            sh = _shift_rows(slab, dy * u)
            acc = acc + jnp.dot(
                sh, wm_ref[(3 * dz + dy + 1) * LANES :
                           (3 * dz + dy + 2) * LANES],
                preferred_element_type=jnp.float32,
            )
    return acc


def _halo_specs(rows: int, kd: int, d: int):
    """prev (1 slab), cur (kd slabs), next (1 slab) BlockSpecs."""
    prev = pl.BlockSpec(
        (1, 1, rows, LANES),
        lambda i, j: (i, jnp.maximum(kd * j - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    cur = pl.BlockSpec(
        (1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    nxt = pl.BlockSpec(
        (1, 1, rows, LANES),
        lambda i, j: (i, jnp.minimum(kd * j + kd, d - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return prev, cur, nxt


def _kernel(*refs, u: int, c: int, kd: int, activate: bool, want_stats: bool,
            has_accum: bool, stats_skip_edges: bool = False):
    it = iter(refs)
    xm_ref, x0_ref, xp_ref = next(it), next(it), next(it)
    scale_ref, shift_ref = next(it), next(it)
    wm_ref, we_ref, bias_ref = next(it), next(it), next(it)
    accum_ref = next(it) if has_accum else None
    y_ref = next(it)
    stats_ref = next(it) if want_stats else None

    # Software-pipelined window: slice k consumes window[k:k+3]; the one
    # slab slice k+1 newly needs is appended BEFORE slice k's matmuls.
    prep = _window_prep_fn(xm_ref, x0_ref, xp_ref, scale_ref, shift_ref,
                           activate, kd, u, c)
    window = [prep(0), prep(1), prep(2)]

    if want_stats:
        # per-lane sum / sumsq of the layer output, accumulated across
        # the d grid axis (out block index is d-invariant -> stays in
        # VMEM). Two parity-split local accumulators break the serial
        # through-memory chain between slices; one += at the end.
        @pl.when(pl.program_id(1) == 0)
        def _():
            stats_ref[0] = jnp.zeros_like(stats_ref[0])

        s_acc = [jnp.zeros((2, LANES), jnp.float32) for _ in range(2)]

    for k in range(kd):
        if k + 1 < kd:
            window.append(prep(k + 3))
        acc = _conv_core(window[k : k + 3], wm_ref, we_ref, u, c) \
            + bias_ref[0]
        if has_accum:
            acc = acc + accum_ref[0, k].astype(jnp.float32)
        y_ref[0, k] = acc.astype(y_ref.dtype)
        if want_stats:
            contrib = jnp.stack(
                [jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)]
            )
            if stats_skip_edges:
                # grid-parallel halo-concat slabs: the first/last output
                # slab is dropped by the caller, so exclude it from the
                # next layer's GroupNorm statistics
                gd = pl.program_id(1) * kd + k
                nd = pl.num_programs(1) * kd
                contrib = contrib * jnp.where(
                    (gd > 0) & (gd < nd - 1), 1.0, 0.0
                )
            s_acc[k % 2] = s_acc[k % 2] + contrib

    if want_stats:
        stats_ref[0] += s_acc[0] + s_acc[1]


def _conv_pallas_meta(
    xp, wm, we, bias_lane, scale, shift, accum, meta,
    *, activate: bool, want_stats: bool, interpret,
    stats_skip_edges: bool = False,
):
    b, d, rows, _ = xp.shape
    h, u, c = meta
    kd = _pick_kd(d, rows, accum is not None)
    # under shard_map, outputs must carry the input's varying-across-mesh
    # annotation (same pattern as fused_block.py)
    vma = getattr(jax.typeof(xp), "vma", frozenset())

    prev, cur, nxt = _halo_specs(rows, kd, d)
    bspec = pl.BlockSpec(
        (1, 1, LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        prev,
        cur,
        nxt,
        bspec,
        bspec,
        wspec,
        wspec,
        pl.BlockSpec((1, 1, LANES), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, xp, xp, scale[:, None], shift[:, None],
            wm.astype(jnp.bfloat16), we.astype(jnp.bfloat16),
            bias_lane.reshape(1, 1, LANES)]
    if accum is not None:
        in_specs.append(pl.BlockSpec(
            (1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(accum)

    out_specs = pl.BlockSpec(
        (1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16,
                                     vma=vma)
    if want_stats:
        out_specs = (out_specs, pl.BlockSpec(
            (1, 2, LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32,
                                          vma=vma))

    return pl.pallas_call(
        functools.partial(_kernel, u=u, c=c, kd=kd, activate=activate,
                          want_stats=want_stats,
                          has_accum=accum is not None,
                          stats_skip_edges=stats_skip_edges),
        grid=(b, d // kd),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(*args)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _dgrad_kernel(
    *refs, u: int, c: int, kd: int, activate: bool, has_adj: bool,
    skip_edges: bool, want_gadj: bool,
):
    """da = conv(gy, flip(w)^T); dx = da * relu' * scale; plus the per-lane
    dscale/dshift reductions, accumulated over the d grid dimension.

    With ``has_adj``, the GroupNorm-stats cotangent broadcast
    ``gy + gs1 + 2*gs2*y`` is folded into the gy window reads (no
    standalone XLA pass over the packed array); ``want_gadj`` writes the
    adjusted cotangent out too (the add-variant's accum gradient)."""
    it = iter(refs)
    gym_ref, gy0_ref, gyp_ref = next(it), next(it), next(it)
    adj = None
    if has_adj:
        adj = (next(it), next(it), next(it), next(it), next(it), skip_edges)
    x0_ref, scale_ref, shift_ref = next(it), next(it), next(it)
    wm_ref, we_ref = next(it), next(it)
    dx_ref, dstats_ref = next(it), next(it)
    gadj_ref = next(it) if want_gadj else None

    prep = _window_prep_fn(gym_ref, gy0_ref, gyp_ref, None, None, False, kd,
                           u, c, adj=adj)
    window = [prep(0), prep(1), prep(2)]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dstats_ref[0] = jnp.zeros_like(dstats_ref[0])

    if activate:
        s_acc = [jnp.zeros((2, LANES), jnp.float32) for _ in range(2)]

    for k in range(kd):
        if k + 1 < kd:
            window.append(prep(k + 3))
        if want_gadj:
            gadj_ref[0, k] = window[k + 1][0]
        # the epilogue's x read/upcast is VPU work independent of the
        # matmuls — emit it ahead of them too
        if activate:
            xs = x0_ref[0, k].astype(jnp.float32)
            pre = xs * scale_ref[0, 0] + shift_ref[0, 0]
        da = _conv_core(window[k : k + 3], wm_ref, we_ref, u, c)
        if activate:
            dam = jnp.where(pre > 0, da, 0.0)
            dx_ref[0, k] = (dam * scale_ref[0, 0]).astype(dx_ref.dtype)
            s_acc[k % 2] = s_acc[k % 2] + jnp.stack(
                [jnp.sum(dam * xs, axis=0), jnp.sum(dam, axis=0)]
            )
        else:
            dx_ref[0, k] = da.astype(dx_ref.dtype)

    if activate:
        dstats_ref[0] += s_acc[0] + s_acc[1]


def _dgrad_pallas(gy, xp, scale, shift, wm_t, we_t, meta,
                  *, activate, interpret, adj=None, want_gadj=False):
    b, d, rows, _ = xp.shape
    h, u, c = meta
    kd = _pick_kd(d, rows)
    vma = getattr(jax.typeof(xp), "vma", frozenset())

    prev, cur, nxt = _halo_specs(rows, kd, d)
    bspec = pl.BlockSpec(
        (1, 1, LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)

    in_specs = [prev, cur, nxt]
    args = [gy, gy, gy]
    if adj is not None:
        yp, gs1, gs2, skip_edges = adj
        yprev, ycur, ynxt = _halo_specs(rows, kd, d)
        in_specs += [yprev, ycur, ynxt, bspec, bspec]
        args += [yp, yp, yp, gs1[:, None], gs2[:, None]]
    else:
        skip_edges = False
    in_specs += [dspec, bspec, bspec, wspec, wspec]
    args += [xp, scale[:, None], shift[:, None],
             wm_t.astype(jnp.bfloat16), we_t.astype(jnp.bfloat16)]

    out_specs = [
        dspec,
        pl.BlockSpec((1, 2, LANES), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16, vma=vma),
        jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32, vma=vma),
    ]
    if want_gadj:
        out_specs.append(dspec)
        out_shape.append(
            jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16, vma=vma)
        )

    out = pl.pallas_call(
        functools.partial(_dgrad_kernel, u=u, c=c, kd=kd, activate=activate,
                          has_adj=adj is not None, skip_edges=skip_edges,
                          want_gadj=want_gadj),
        grid=(b, d // kd),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(*args)
    if want_gadj:
        return out
    dx, dstats = out
    return dx, dstats, None


def _wgrad_kernel(
    *refs, u: int, c: int, kd: int, activate: bool, has_adj: bool,
    skip_edges: bool,
):
    """dwm_t += a_shifted^T @ gy; dwe += pe^T @ gy; dbias += sum(gy) —
    all three accumulated across the entire (b, d) grid. With
    ``has_adj`` the stats-cotangent broadcast is folded into the gy
    slice reads (same formula as _dgrad_kernel's windows)."""
    it = iter(refs)
    xm_ref, x0_ref, xp_ref, gy0_ref = next(it), next(it), next(it), next(it)
    y0_ref = gs1_ref = gs2_ref = None
    if has_adj:
        y0_ref, gs1_ref, gs2_ref = next(it), next(it), next(it)
    scale_ref, shift_ref = next(it), next(it)
    dwm_ref, dwe_ref, dbias_ref = next(it), next(it), next(it)

    prep = _window_prep_fn(xm_ref, x0_ref, xp_ref, scale_ref, shift_ref,
                           activate, kd, u, c)
    window = [prep(0), prep(1), prep(2)]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dwm_ref[:] = jnp.zeros_like(dwm_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    j = pl.program_id(1)
    nj = pl.num_programs(1)
    dn = (((0,), (0,)), ((), ()))
    db_acc = [jnp.zeros((LANES,), jnp.float32) for _ in range(2)]
    for k in range(kd):
        if k + 1 < kd:
            window.append(prep(k + 3))
        gy = gy0_ref[0, k]
        if has_adj:
            t = (gs1_ref[0, 0] + 2.0 * gs2_ref[0, 0]
                 * y0_ref[0, k].astype(jnp.float32))
            if skip_edges:
                dg = j * kd + k
                t = t * jnp.where((dg > 0) & (dg < nj * kd - 1), 1.0, 0.0)
            gy = (gy.astype(jnp.float32) + t).astype(jnp.bfloat16)
        for dz, (slab, panel) in enumerate(window[k : k + 3]):
            dwe_ref[dz * 6 * c : (dz + 1) * 6 * c] += jax.lax.dot_general(
                panel, gy, dn, preferred_element_type=jnp.float32
            )
            for dy in (-1, 0, 1):
                sh = _shift_rows(slab, dy * u)
                t = 3 * dz + dy + 1
                dwm_ref[t * LANES : (t + 1) * LANES] += jax.lax.dot_general(
                    sh, gy, dn, preferred_element_type=jnp.float32
                )
        db_acc[k % 2] = db_acc[k % 2] + jnp.sum(
            gy.astype(jnp.float32), axis=0
        )
    dbias_ref[0] += db_acc[0] + db_acc[1]


def _wgrad_pallas(xp, gy, scale, shift, meta, *, activate, interpret,
                  adj=None):
    b, d, rows, _ = xp.shape
    h, u, c = meta
    kd = _pick_kd(d, rows)
    vma = getattr(jax.typeof(xp), "vma", frozenset())

    prev, cur, nxt = _halo_specs(rows, kd, d)
    bspec = pl.BlockSpec(
        (1, 1, LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dspec = pl.BlockSpec((1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    in_specs = [prev, cur, nxt, dspec]
    args = [xp, xp, xp, gy]
    if adj is not None:
        yp, gs1, gs2, skip_edges = adj
        in_specs += [dspec, bspec, bspec]
        args += [yp, gs1[:, None], gs2[:, None]]
    else:
        skip_edges = False
    in_specs += [bspec, bspec]
    args += [scale[:, None], shift[:, None]]

    dwm, dwe, dbias = pl.pallas_call(
        functools.partial(_wgrad_kernel, u=u, c=c, kd=kd, activate=activate,
                          has_adj=adj is not None, skip_edges=skip_edges),
        grid=(b, d // kd),
        in_specs=in_specs,
        out_specs=(
            cspec((9 * LANES, LANES)),
            cspec((18 * c, LANES)),
            cspec((1, LANES)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9 * LANES, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((18 * c, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32, vma=vma),
        ),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(*args)
    return dwm, dwe, dbias


def _transpose_flip(w):
    """Weights of the conv whose output is dL/da: flip taps, swap IO."""
    return jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)


def _unpack_wgrad(dwm, dwe, c):
    """Inverse of pack_weights: fold the banded/edge copies back into the
    raw (3, 3, 3, C, C) gradient."""
    p = LANES // c
    m = _placement(p)
    dw9 = jnp.einsum("xij,tiajb->txab", m, dwm.reshape(9, p, c, p, c))
    dwe5 = dwe.reshape(9, 2, c, p, c)
    dw9 = dw9.at[:, 0].add(dwe5[:, 0, :, 0, :])
    dw9 = dw9.at[:, 2].add(dwe5[:, 1, :, p - 1, :])
    return dw9.reshape(3, 3, 3, c, c)


# ---------------------------------------------------------------------------
# shared fwd/bwd plumbing for the packed public ops
# ---------------------------------------------------------------------------

def _run_fwd(xp, w, bias, scale, shift, accum, meta, activate, want_stats,
             interpret, stats_skip_edges=False):
    wm, we = pack_weights(w)
    bias_lane = jnp.tile(bias.astype(jnp.float32), LANES // bias.shape[0])
    return _conv_pallas_meta(
        xp, wm, we, bias_lane[None], scale, shift, accum, meta,
        activate=activate, want_stats=want_stats, interpret=interpret,
        stats_skip_edges=stats_skip_edges,
    )


def _run_bwd(res, gy, gstats, meta, activate, interpret,
             stats_skip_edges=False, want_gadj=False, need_dx=True):
    """Shared backward. gstats=None when the op had no stats output.

    With stats, the cotangent entering the conv accumulator is
    g' = gy + gs1 + 2*gs2*y  (per-lane broadcast of the sum/sumsq
    cotangents). The broadcast is folded into the dgrad/wgrad kernels'
    gy reads (it used to be a standalone XLA pass over the packed
    arrays — ~0.3 ms per level-0 conv of pure HBM traffic the kernels'
    MXU-bound schedules absorb for free); the add-variant's accum
    gradient IS g', so ``want_gadj`` has dgrad write it out as an extra
    output. When the forward skipped the edge slabs' stats, the
    broadcast skips them too (their only cotangent is the incoming gy,
    which the caller's edge-drop slice already zeroed).

    ``need_dx=False`` (stem-style calls whose input is DATA — the
    voxelized grid — so the input cotangent is dead) skips the dgrad
    kernel entirely: a full inflated-FLOPs conv pass XLA cannot DCE out
    of the opaque multi-output pallas_call. Only valid with
    ``activate=False`` (otherwise dgrad also owns dscale/dshift).
    """
    xp, w, scale, shift, yp = res
    c = meta[2]
    adj = None
    if gstats is not None:
        adj = (yp, gstats[:, 0], gstats[:, 1], stats_skip_edges)
    gy = gy.astype(jnp.bfloat16)
    if not need_dx and not activate and not want_gadj:
        # zeros cotangent for the dead data input; DCE'd downstream
        dx, dstats, gadj = jnp.zeros_like(xp), None, None
    else:
        wm_t, we_t = pack_weights(_transpose_flip(w))
        dx, dstats, gadj = _dgrad_pallas(
            gy, xp, scale, shift, wm_t, we_t, meta,
            activate=activate, interpret=interpret, adj=adj,
            want_gadj=want_gadj and adj is not None,
        )
    dwm, dwe, dbias_lane = _wgrad_pallas(
        xp, gy, scale, shift, meta, activate=activate, interpret=interpret,
        adj=adj,
    )
    dw = _unpack_wgrad(dwm, dwe, c).astype(w.dtype)
    dbias = jnp.sum(
        dbias_lane.reshape(LANES // c, c), axis=0
    ).astype(jnp.float32)
    if activate:
        dscale, dshift = dstats[:, 0], dstats[:, 1]
    else:
        dscale = jnp.zeros_like(scale)
        dshift = jnp.zeros_like(shift)
    return (dx, dw, dbias, dscale.astype(scale.dtype),
            dshift.astype(shift.dtype), gadj if adj is not None else gy)


# ---------------------------------------------------------------------------
# public packed ops
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_conv3x3_p(xp, w, bias, scale, shift, meta, activate=True,
                    want_stats=True, interpret=None,
                    stats_skip_edges=False, need_dx=True):
    """Packed fused block: relu(xp*scale+shift) -> 3^3 conv -> +bias.

    xp: (B, D, rows, 128) bf16 packed grid (see pack_grid); meta=(h,u,c).
    Returns bf16 yp, plus — when ``want_stats`` — a (B, 2, 128) f32 of
    per-lane (sum, sumsq) of the output, accumulated in-kernel for the
    next layer's GroupNorm (see stats_scale_shift).
    ``stats_skip_edges`` excludes the first/last d slab from the stats —
    for grid-parallel halo-concat callers that drop the edge outputs.
    ``need_dx=False`` (requires ``activate=False``): the caller promises
    the input cotangent is dead (stem calls on the voxelized grid), so
    the backward skips the dgrad kernel — see _run_bwd.
    """
    out = _run_fwd(xp, w, bias, scale, shift, None, meta, activate,
                   want_stats, interpret, stats_skip_edges)
    return out


def _p_fwd(xp, w, bias, scale, shift, meta, activate, want_stats, interpret,
           stats_skip_edges, need_dx):
    out = _run_fwd(xp, w, bias, scale, shift, None, meta, activate,
                   want_stats, interpret, stats_skip_edges)
    yp = out[0] if want_stats else out
    return out, (xp, w, scale, shift, yp if want_stats else None)


def _p_bwd(meta, activate, want_stats, interpret, stats_skip_edges, need_dx,
           res, g):
    gy, gstats = g if want_stats else (g, None)
    dx, dw, dbias, dscale, dshift, _ = _run_bwd(
        res, gy, gstats, meta, activate, interpret, stats_skip_edges,
        need_dx=need_dx,
    )
    return dx, dw, dbias, dscale, dshift


fused_conv3x3_p.defvjp(_p_fwd, _p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_conv3x3_add_p(xp, accum, w, bias, scale, shift, meta,
                        activate=True, interpret=None,
                        stats_skip_edges=False):
    """Like fused_conv3x3_p, plus a packed bf16 ``accum`` added to the
    conv output before the bias'd result is written / statted. Used for
    the decoder's concat-free skip merge: conv([a,b],W) ==
    conv(a, W[:, :w]) + conv(b, W[:, w:]) with the add and the next GN's
    stats fused into the second conv's kernel. Always returns stats.
    ``stats_skip_edges`` as in fused_conv3x3_p (the grid-parallel caller
    passes an extended accum whose edge slabs are dropped downstream).
    """
    return _run_fwd(xp, w, bias, scale, shift, accum, meta, activate,
                    True, interpret, stats_skip_edges)


def _pa_fwd(xp, accum, w, bias, scale, shift, meta, activate, interpret,
            stats_skip_edges):
    yp, stats = _run_fwd(xp, w, bias, scale, shift, accum, meta, activate,
                         True, interpret, stats_skip_edges)
    return (yp, stats), (xp, w, scale, shift, yp)


def _pa_bwd(meta, activate, interpret, stats_skip_edges, res, g):
    gy, gstats = g
    dx, dw, dbias, dscale, dshift, gacc = _run_bwd(
        res, gy, gstats, meta, activate, interpret, stats_skip_edges,
        want_gadj=True,
    )
    return dx, gacc, dw, dbias, dscale, dshift


fused_conv3x3_add_p.defvjp(_pa_fwd, _pa_bwd)


def fused_conv3x3(x, w, bias, scale, shift, activate=True, interpret=None):
    """5-D convenience wrapper: relu(x*scale+shift) -> 3^3 SAME conv ->
    +bias, one kernel.

    x: (B, D, H, W, C) bf16 raw previous-layer output. C must divide 128
    and W must be a multiple of 128/C. w: (3, 3, 3, C, C) DHWIO.
    scale/shift: (B, 128) f32 folded GroupNorm (per-lane, C-periodic);
    ignored when ``activate=False``. Returns bf16 (B, M, H, W, C).
    Prefer the packed-level ops in layer chains (see module docstring).
    """
    xp, meta = pack_grid(x)
    yp = fused_conv3x3_p(xp, w, bias, scale, shift, meta, activate, False,
                         interpret)
    return unpack_grid(yp, *x.shape[2:])


# ---------------------------------------------------------------------------
# packed elementwise / stats helpers
# ---------------------------------------------------------------------------

def act_packed(xp: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
    """relu(xp * scale + shift) on the packed view — the kernel-prologue
    contract as a standalone (XLA-fused) op, for XLA-conv boundaries."""
    a = jnp.maximum(
        xp.astype(jnp.float32) * scale[:, None, None, :]
        + shift[:, None, None, :],
        0.0,
    )
    return a.astype(jnp.bfloat16)


def packed_stats(xp: jax.Array) -> jax.Array:
    """(B, 2, 128) per-lane (sum, sumsq) of a packed grid — XLA fallback
    for boundaries where no fused kernel produced stats."""
    xf = xp.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))
    s2 = jnp.sum(xf * xf, axis=(1, 2))
    return jnp.stack([s1, s2], axis=1)


def stats_scale_shift(
    stats: jax.Array, gn_scale: jax.Array, gn_bias: jax.Array,
    groups: int, nvox: int,
) -> tuple[jax.Array, jax.Array]:
    """Fold per-lane (sum, sumsq) into per-lane GN (scale, shift).

    nvox = D*H*W of the grid the stats were taken over.
    """
    c = gn_scale.shape[0]
    b = stats.shape[0]
    p = LANES // c
    g = min(groups, c)
    while c % g:
        g -= 1
    s = jnp.sum(stats.reshape(b, 2, p, g, c // g), axis=(2, 4))  # (b, 2, g)
    n = nvox * (c // g)
    mean = s[:, 0] / n
    var = s[:, 1] / n - jnp.square(mean)
    return fold_gn(mean, var, gn_scale, gn_bias, g)


# ---------------------------------------------------------------------------
# reference composition (parity tests)
# ---------------------------------------------------------------------------

def _act(x, scale, shift, c, activate):
    """Per-lane affine + ReLU on a 5-D grid (packs, applies, unpacks)."""
    if not activate:
        return x.astype(jnp.bfloat16)
    xp, _ = pack_grid(x)
    return unpack_grid(act_packed(xp, scale, shift), *x.shape[2:])


def _conv_ref(x, w, bias, scale, shift, *, activate):
    c = x.shape[-1]
    a = _act(x, scale, shift, c, activate)
    # no explicit f32 output type: mixed-dtype cotangents break the conv
    # transpose under autodiff (same constraint as ops/conv3d.py); the MXU
    # accumulates in f32 regardless
    y = jax.lax.conv_general_dilated(
        a, w.astype(jnp.bfloat16), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return (y.astype(jnp.float32) + bias).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# GroupNorm folding helpers (stats -> per-lane scale/shift)
# ---------------------------------------------------------------------------

def grid_group_stats(y: jax.Array, groups: int) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, group) mean/var of a (B, D, H, W, C) grid — the same
    statistics group_norm (ops/conv3d.py) computes.

    Reduces on the lane-packed (B, N, 128) view: reducing the naive
    (B, N, g, C/g) shape makes XLA relayout the narrow-channel grid
    (measured 8.2 ms vs 1.7 ms for conv+stats at B8 x 64^3 x 16ch); the
    packed reduce keeps the minor dim at 128 lanes and folds the
    (position, channel) lane structure down to groups afterwards."""
    b, d, h, w, c = y.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    if LANES % c == 0 and w % (LANES // c) == 0:
        p = LANES // c
        yv = y.astype(jnp.float32).reshape(b, -1, LANES)
        s1 = jnp.sum(yv, axis=1).reshape(b, p, g, c // g)
        s2 = jnp.sum(yv * yv, axis=1).reshape(b, p, g, c // g)
        n = d * h * w * (c // g)
        mean = jnp.sum(s1, axis=(1, 3)) / n
        var = jnp.sum(s2, axis=(1, 3)) / n - jnp.square(mean)
        return mean, var
    yf = y.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = jnp.mean(yf, axis=(1, 3))
    var = jnp.mean(jnp.square(yf), axis=(1, 3)) - jnp.square(mean)
    return mean, var


def fold_gn(
    mean: jax.Array, var: jax.Array, gn_scale: jax.Array, gn_bias: jax.Array,
    groups: int, eps: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """Fold GroupNorm into per-lane (B, 128) scale/shift for the kernel
    prologue: relu(x * scale + shift) == relu(GN(x))."""
    c = gn_scale.shape[0]
    g = mean.shape[1]
    inv = jax.lax.rsqrt(var + eps)                       # (B, g)
    per_c_inv = jnp.repeat(inv, c // g, axis=1)          # (B, C)
    per_c_mean = jnp.repeat(mean, c // g, axis=1)
    scale = per_c_inv * gn_scale[None]
    shift = gn_bias[None] - per_c_mean * scale
    reps = LANES // c
    return jnp.tile(scale, (1, reps)), jnp.tile(shift, (1, reps))


# ---------------------------------------------------------------------------
# packed stride-2 down / up and 1x1 head — XLA matmuls on the packed form
# ---------------------------------------------------------------------------
#
# The k=2/s=2 (transposed-)convs and the 1x1 head are the only non-3^3
# pieces of the U-Net. Left as 5-D XLA convs they force relayout copies at
# every Pallas boundary (see module docstring) and run at narrow-C lane
# utilization. On the packed view they are exact LANE-MAPPED MATMULS:
# the stride-2 x-split (w = w1*P + w2, w_in = 2*w_out + dx, and
# 2*w2' + dx <= P-1 so the block index w1 never overflows) folds into a
# constant (128, 128) weight per (dz, dy) tap, and the h/d strides are
# plain reshape-slices on non-minor axes. Four 128x128 matmuls per op,
# no convs, no scatter, autodiff-friendly.

def _stride2_lane_map(p_in: int) -> jnp.ndarray:
    """D[dx, w2_in, w2_out] = 1 iff w2_in == 2*w2_out + dx."""
    import numpy as np

    p_out = p_in // 2
    d = np.zeros((2, p_in, p_out), np.float32)
    for w2o in range(p_out):
        for dx in range(2):
            d[dx, 2 * w2o + dx, w2o] = 1.0
    return jnp.asarray(d)


def _bias_lane(bias, c):
    return jnp.tile(bias.astype(jnp.float32), LANES // c)


def down2x_packed(xp, w, bias, meta, want_stats=False):
    """Stride-2 k=2 conv on the packed form: meta (h,u,c) -> (h/2,u,2c).

    w: (2, 2, 2, C, 2C) DHWIO — same params as ops/conv3d.py conv3d
    (stride=2); numerics identical modulo bf16 summation order.
    ``want_stats`` additionally returns the next GroupNorm's per-lane
    (B, 2, 128) (sum, sumsq), reduced from the f32 accumulator in the
    same fusion instead of a separate packed_stats HBM pass over the
    bf16 output (stats are therefore pre-rounding).
    """
    h, u, c = meta
    b, d, rows, _ = xp.shape
    c2 = w.shape[-1]
    if c2 != 2 * c:
        raise ValueError(f"down2x_packed needs Cout == 2*Cin, got {c}->{c2}")
    dmap = _stride2_lane_map(LANES // c)
    wd = jnp.einsum("xij,zyxab->zyiajb", dmap, w).reshape(
        2, 2, LANES, LANES
    ).astype(jnp.bfloat16)
    x6 = xp.reshape(b, d // 2, 2, h // 2, 2, u, LANES)
    acc = jnp.zeros((b, d // 2, (h // 2) * u, LANES), jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            s = x6[:, :, dz, :, dy].reshape(b, d // 2, (h // 2) * u, LANES)
            acc = acc + jax.lax.dot_general(
                s, wd[dz, dy], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    yf = acc + _bias_lane(bias, c2)
    yp = yf.astype(jnp.bfloat16)
    if want_stats:
        stats = jnp.stack(
            [jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))],
            axis=1,
        )
        return yp, (h // 2, u, c2), stats
    return yp, (h // 2, u, c2)


def up2x_packed(xp, w, bias, meta, want_stats=False):
    """Stride-2 k=2 TRANSPOSED conv on the packed form:
    meta (h',u,c2) -> (2h',u,c2/2).

    w: (2, 2, 2, C2, C2/2) — same params as ops/conv3d.py conv3d_transpose
    (which places x[i'] @ w[1-dz,1-dy,1-dx] at output 2i'+dz; verified
    numerically). ``want_stats``: also return the next GroupNorm's
    per-lane (B, 2, 128) (sum, sumsq). The interleave preserves lanes,
    so the stats are the sum of each part's f32 per-lane stats — reduced
    in the same fusion as the matmuls, no extra pass over the output."""
    h2, u, c2 = meta
    b, d2, rows2, _ = xp.shape
    c = w.shape[-1]
    if c2 != 2 * c:
        raise ValueError(f"up2x_packed needs Cin == 2*Cout, got {c2}->{c}")
    wflip = jnp.flip(w, axis=(0, 1, 2))
    dmap = _stride2_lane_map(LANES // c)       # D[dx, w2_fine, w2_coarse]
    wu = jnp.einsum("xij,zyxab->zyjaib", dmap, wflip).reshape(
        2, 2, LANES, LANES
    ).astype(jnp.bfloat16)
    blane = _bias_lane(bias, c)
    parts = [[None, None], [None, None]]
    s1 = s2 = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            y = jax.lax.dot_general(
                xp, wu[dz, dy], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + blane
            if want_stats:
                s1 = s1 + jnp.sum(y, axis=(1, 2))
                s2 = s2 + jnp.sum(y * y, axis=(1, 2))
            parts[dz][dy] = y.astype(jnp.bfloat16).reshape(
                b, d2, h2, u, LANES
            )
    rows_dy = [
        jnp.stack([parts[dz][0], parts[dz][1]], axis=3) for dz in (0, 1)
    ]                                           # (b, d2, h2, 2, u, 128)
    a = jnp.stack(rows_dy, axis=2)              # (b, d2, 2, h2, 2, u, 128)
    yp = a.reshape(b, 2 * d2, 2 * h2 * u, LANES)
    if want_stats:
        return yp, (2 * h2, u, c), jnp.stack([s1, s2], axis=1)
    return yp, (2 * h2, u, c)


# ---------------------------------------------------------------------------
# fused stride-2 down / up Pallas kernels
# ---------------------------------------------------------------------------
#
# Kernel versions of down2x_packed / up2x_packed with the previous
# layer's folded-GN ReLU in the prologue and the next GroupNorm's
# (sum, sumsq) in the epilogue — the XLA formulations cost a separate
# full-grid act pass plus slice/stack/convert fusions around the four
# tap matmuls (~1.3 ms of the 64^3 step, ~2.2 ms at 128^3 in the r3
# xplane profiles: maximum_convert / slice_bitcast / pad_maximum /
# add_convert). The y-parity select (down) and interleave (up) run on
# u-row groups; u == 8 at EVERY level of the U-Net (down2x halves h and
# doubles c, leaving u = rows/h fixed), so both are exactly one
# (8, 128) sublane tile — Mosaic-native reshapes, no relayouts.
# Stride-2 windows don't overlap: no halos, no read amplification.

def _down_wd(w, c):
    """(2,2,2,C,2C) -> (4*128, 128) lane-mapped tap matrix (bf16)."""
    dmap = _stride2_lane_map(LANES // c)
    return jnp.einsum("xij,zyxab->zyiajb", dmap, w).reshape(
        4 * LANES, LANES
    ).astype(jnp.bfloat16)


def _down_wd_unpack(dwd, c, c2):
    """Inverse of _down_wd: fold the 0/1 lane placement back."""
    p = LANES // c
    dmap = _stride2_lane_map(p)
    dwd6 = dwd.reshape(2, 2, p, c, p // 2, c2)
    return jnp.einsum("xij,zyiajb->zyxab", dmap, dwd6)


def _up_wu(w, c):
    """(2,2,2,C2,C) -> (4*128, 128) lane-mapped transposed-conv taps."""
    dmap = _stride2_lane_map(LANES // c)
    wflip = jnp.flip(w, axis=(0, 1, 2))
    return jnp.einsum("xij,zyxab->zyjaib", dmap, wflip).reshape(
        4 * LANES, LANES
    ).astype(jnp.bfloat16)


def _up_wu_unpack(dwu, c2, c):
    p = LANES // c
    dmap = _stride2_lane_map(p)
    dwu6 = dwu.reshape(2, 2, p // 2, c2, p, c)
    dwflip = jnp.einsum("xij,zyjaib->zyxab", dmap, dwu6)
    return jnp.flip(dwflip, axis=(0, 1, 2))


def _tap_t(wt):
    """Per-tap transpose of a (4*128, 128) tap matrix."""
    return wt.reshape(4, LANES, LANES).swapaxes(1, 2).reshape(
        4 * LANES, LANES
    )


def _ilv(a, b_, u):
    """Interleave u-row groups of two (rows2, 128) -> (2*rows2, 128)."""
    h2 = a.shape[0] // u
    a4 = a.reshape(h2, 1, u, a.shape[1])
    b4 = b_.reshape(h2, 1, u, b_.shape[1])
    return jnp.concatenate([a4, b4], axis=1).reshape(
        2 * a.shape[0], a.shape[1]
    )


def _down2x_kernel(x_ref, scale_ref, shift_ref, wd_ref, bias_ref,
                   y_ref, stats_ref, *, u):
    @pl.when(pl.program_id(1) == 0)
    def _():
        stats_ref[0] = jnp.zeros_like(stats_ref[0])

    rows = x_ref.shape[2]
    h2 = rows // (2 * u)
    acc = jnp.zeros((rows // 2, LANES), jnp.float32)
    for dz in (0, 1):
        s = _prep_slab(x_ref[0, dz], scale_ref, shift_ref, True)
        s4 = s.reshape(h2, 2, u, LANES)
        for dy in (0, 1):
            sel = s4[:, dy].reshape(rows // 2, LANES)
            t = 2 * dz + dy
            acc = acc + jnp.dot(
                sel, wd_ref[t * LANES : (t + 1) * LANES],
                preferred_element_type=jnp.float32,
            )
    yf = acc + bias_ref[0, 0]
    y_ref[0, 0] = yf.astype(y_ref.dtype)
    stats_ref[0] += jnp.stack([jnp.sum(yf, 0), jnp.sum(yf * yf, 0)])


def _down2x_bwd_kernel(x_ref, gy_ref, y_ref, gs_ref, scale_ref, shift_ref,
                       wdt_ref, dx_ref, dstats_ref, dwd_ref, dbias_ref,
                       *, u):
    j = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _():
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    @pl.when(j == 0)
    def _():
        dstats_ref[0] = jnp.zeros_like(dstats_ref[0])

    rows = x_ref.shape[2]
    h2 = rows // (2 * u)
    # stats-cotangent broadcast (cf. _run_bwd): g' = gy + gs1 + 2*gs2*y
    ge = (gy_ref[0, 0].astype(jnp.float32)
          + gs_ref[0, 0]
          + 2.0 * gs_ref[0, 1] * y_ref[0, 0].astype(jnp.float32))
    gyb = ge.astype(jnp.bfloat16)
    dbias_ref[0] += jnp.sum(ge, axis=0)

    st = jnp.zeros((2, LANES), jnp.float32)
    for dz in (0, 1):
        xs = x_ref[0, dz].astype(jnp.float32)
        pre = xs * scale_ref[0, 0] + shift_ref[0, 0]
        s4 = jnp.maximum(pre, 0.0).astype(jnp.bfloat16).reshape(
            h2, 2, u, LANES
        )
        das = []
        for dy in (0, 1):
            t = 2 * dz + dy
            das.append(jnp.dot(
                gyb, wdt_ref[t * LANES : (t + 1) * LANES],
                preferred_element_type=jnp.float32,
            ))
            dwd_ref[t * LANES : (t + 1) * LANES] += jax.lax.dot_general(
                s4[:, dy].reshape(rows // 2, LANES), gyb,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        da = _ilv(das[0], das[1], u)
        dam = jnp.where(pre > 0, da, 0.0)
        dx_ref[0, dz] = (dam * scale_ref[0, 0]).astype(dx_ref.dtype)
        st = st + jnp.stack([jnp.sum(dam * xs, 0), jnp.sum(dam, 0)])
    dstats_ref[0] += st


def _up2x_kernel(x_ref, scale_ref, shift_ref, wu_ref, bias_ref,
                 y_ref, stats_ref, *, u):
    @pl.when(pl.program_id(1) == 0)
    def _():
        stats_ref[0] = jnp.zeros_like(stats_ref[0])

    s = _prep_slab(x_ref[0, 0], scale_ref, shift_ref, True)
    st = jnp.zeros((2, LANES), jnp.float32)
    for dz in (0, 1):
        parts = []
        for dy in (0, 1):
            t = 2 * dz + dy
            yf = jnp.dot(
                s, wu_ref[t * LANES : (t + 1) * LANES],
                preferred_element_type=jnp.float32,
            ) + bias_ref[0, 0]
            st = st + jnp.stack([jnp.sum(yf, 0), jnp.sum(yf * yf, 0)])
            parts.append(yf.astype(y_ref.dtype))
        y_ref[0, dz] = _ilv(parts[0], parts[1], u)
    stats_ref[0] += st


def _up2x_bwd_kernel(x_ref, gy_ref, y_ref, gs_ref, scale_ref, shift_ref,
                     wut_ref, dx_ref, dstats_ref, dwu_ref, dbias_ref,
                     *, u):
    j = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _():
        dwu_ref[:] = jnp.zeros_like(dwu_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    @pl.when(j == 0)
    def _():
        dstats_ref[0] = jnp.zeros_like(dstats_ref[0])

    rows2 = x_ref.shape[2]
    h2 = rows2 // u
    xs = x_ref[0, 0].astype(jnp.float32)
    pre = xs * scale_ref[0, 0] + shift_ref[0, 0]
    s = jnp.maximum(pre, 0.0).astype(jnp.bfloat16)

    da = jnp.zeros((rows2, LANES), jnp.float32)
    db = jnp.zeros((LANES,), jnp.float32)
    for dz in (0, 1):
        ge = (gy_ref[0, dz].astype(jnp.float32)
              + gs_ref[0, 0]
              + 2.0 * gs_ref[0, 1] * y_ref[0, dz].astype(jnp.float32))
        db = db + jnp.sum(ge, axis=0)
        ge4 = ge.reshape(h2, 2, u, LANES)
        for dy in (0, 1):
            t = 2 * dz + dy
            gsel = ge4[:, dy].reshape(rows2, LANES).astype(jnp.bfloat16)
            da = da + jnp.dot(
                gsel, wut_ref[t * LANES : (t + 1) * LANES],
                preferred_element_type=jnp.float32,
            )
            dwu_ref[t * LANES : (t + 1) * LANES] += jax.lax.dot_general(
                s, gsel, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    dam = jnp.where(pre > 0, da, 0.0)
    dx_ref[0, 0] = (dam * scale_ref[0, 0]).astype(dx_ref.dtype)
    dstats_ref[0] += jnp.stack([jnp.sum(dam * xs, 0), jnp.sum(dam, 0)])
    dbias_ref[0] += db


def _updown_common_specs(rows_x, nx, rows_y, ny):
    """(x, scale, shift, w, bias) in_specs for the down/up calls.
    ``nx``/``ny`` slabs per program on the x / y side."""
    xspec = pl.BlockSpec((1, nx, rows_x, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, LANES), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((1, ny, rows_y, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 2, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return xspec, bspec, cspec, wspec, yspec, sspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _down2x_vjp(xp, w, bias, scale, shift, meta, interpret):
    h, u, c = meta
    b, d, rows, _ = xp.shape
    wd = _down_wd(w, c)
    bias_lane = _bias_lane(bias, 2 * c).reshape(1, 1, LANES)
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    xspec, bspec, cspec, wspec, yspec, sspec = _updown_common_specs(
        rows, 2, rows // 2, 1
    )
    return pl.pallas_call(
        functools.partial(_down2x_kernel, u=u),
        grid=(b, d // 2),
        in_specs=[xspec, bspec, bspec, wspec, cspec],
        out_specs=(yspec, sspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, d // 2, rows // 2, LANES),
                                 jnp.bfloat16, vma=vma),
            jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32, vma=vma),
        ),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, scale[:, None], shift[:, None], wd, bias_lane)


def _down2x_fwd(xp, w, bias, scale, shift, meta, interpret):
    yp, stats = _down2x_vjp(xp, w, bias, scale, shift, meta, interpret)
    return (yp, stats), (xp, w, scale, shift, yp)


def _down2x_bwd(meta, interpret, res, g):
    xp, w, scale, shift, yp = res
    gy, gstats = g
    h, u, c = meta
    b, d, rows, _ = xp.shape
    wdt = _tap_t(_down_wd(w, c))
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    xspec, bspec, cspec, wspec, yspec, sspec = _updown_common_specs(
        rows, 2, rows // 2, 1
    )
    gsspec = pl.BlockSpec((1, 2, LANES), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    dx, dstats, dwd, dbias_lane = pl.pallas_call(
        functools.partial(_down2x_bwd_kernel, u=u),
        grid=(b, d // 2),
        in_specs=[xspec, yspec, yspec, gsspec, bspec, bspec, wspec],
        out_specs=(xspec, sspec, full((4 * LANES, LANES)),
                   full((1, LANES))),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16,
                                 vma=vma),
            jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((4 * LANES, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32, vma=vma),
        ),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, gy.astype(jnp.bfloat16), yp, gstats, scale[:, None],
      shift[:, None], wdt)
    c2 = 2 * c
    dw = _down_wd_unpack(dwd, c, c2).astype(w.dtype)
    dbias = jnp.sum(dbias_lane.reshape(LANES // c2, c2), axis=0)
    return (dx, dw, dbias.astype(jnp.float32),
            dstats[:, 0].astype(scale.dtype),
            dstats[:, 1].astype(shift.dtype))


_down2x_vjp.defvjp(_down2x_fwd, _down2x_bwd)


def fused_down2x_p(xp, w, bias, scale, shift, meta, interpret=None):
    """relu(xp*scale+shift) -> stride-2 k=2 conv -> +bias, one kernel.

    Same params/semantics as ``down2x_packed(act_packed(xp, sc, sh), w,
    bias, meta, want_stats=True)`` with the act pass and the stats fused
    into the kernel. Returns (yp, meta2, stats)."""
    h, u, c = meta
    yp, stats = _down2x_vjp(xp, w, bias, scale, shift, (h, u, c), interpret)
    return yp, (h // 2, u, 2 * c), stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _up2x_vjp(xp, w, bias, scale, shift, meta, interpret):
    h2, u, c2 = meta
    c = c2 // 2
    b, d2, rows2, _ = xp.shape
    wu = _up_wu(w, c)
    bias_lane = _bias_lane(bias, c).reshape(1, 1, LANES)
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    xspec, bspec, cspec, wspec, yspec, sspec = _updown_common_specs(
        rows2, 1, 2 * rows2, 2
    )
    return pl.pallas_call(
        functools.partial(_up2x_kernel, u=u),
        grid=(b, d2),
        in_specs=[xspec, bspec, bspec, wspec, cspec],
        out_specs=(yspec, sspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, 2 * d2, 2 * rows2, LANES),
                                 jnp.bfloat16, vma=vma),
            jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32, vma=vma),
        ),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, scale[:, None], shift[:, None], wu, bias_lane)


def _up2x_fwd(xp, w, bias, scale, shift, meta, interpret):
    yp, stats = _up2x_vjp(xp, w, bias, scale, shift, meta, interpret)
    return (yp, stats), (xp, w, scale, shift, yp)


def _up2x_bwd(meta, interpret, res, g):
    xp, w, scale, shift, yp = res
    gy, gstats = g
    h2, u, c2 = meta
    c = c2 // 2
    b, d2, rows2, _ = xp.shape
    wut = _tap_t(_up_wu(w, c))
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    xspec, bspec, cspec, wspec, yspec, sspec = _updown_common_specs(
        rows2, 1, 2 * rows2, 2
    )
    gsspec = pl.BlockSpec((1, 2, LANES), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    dx, dstats, dwu, dbias_lane = pl.pallas_call(
        functools.partial(_up2x_bwd_kernel, u=u),
        grid=(b, d2),
        in_specs=[xspec, yspec, yspec, gsspec, bspec, bspec, wspec],
        out_specs=(xspec, sspec, full((4 * LANES, LANES)),
                   full((1, LANES))),
        out_shape=(
            jax.ShapeDtypeStruct((b, d2, rows2, LANES), jnp.bfloat16,
                                 vma=vma),
            jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((4 * LANES, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32, vma=vma),
        ),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, gy.astype(jnp.bfloat16), yp, gstats, scale[:, None],
      shift[:, None], wut)
    dw = _up_wu_unpack(dwu, c2, c).astype(w.dtype)
    dbias = jnp.sum(dbias_lane.reshape(LANES // c, c), axis=0)
    return (dx, dw, dbias.astype(jnp.float32),
            dstats[:, 0].astype(scale.dtype),
            dstats[:, 1].astype(shift.dtype))


_up2x_vjp.defvjp(_up2x_fwd, _up2x_bwd)


def fused_up2x_p(xp, w, bias, scale, shift, meta, interpret=None):
    """relu(xp*scale+shift) -> stride-2 k=2 TRANSPOSED conv -> +bias.

    Same params/semantics as ``up2x_packed(act_packed(xp, sc, sh), w,
    bias, meta, want_stats=True)`` fused into one kernel. Returns
    (yp, meta2, stats)."""
    h2, u, c2 = meta
    yp, stats = _up2x_vjp(xp, w, bias, scale, shift, (h2, u, c2), interpret)
    return yp, (2 * h2, u, c2 // 2), stats


# ---------------------------------------------------------------------------
# fused 1x1 head kernel (act prologue + lane-mapped head matmul)
# ---------------------------------------------------------------------------

def _head_wh(w, c, nc):
    """(1,1,1,C,NC) (or (C,NC)) -> (128, p*nc) block-diagonal lane map."""
    k = w.reshape(w.shape[-2], w.shape[-1])
    p = LANES // c
    return jnp.einsum(
        "ij,ab->iajb", jnp.eye(p, dtype=k.dtype), k
    ).reshape(LANES, p * nc).astype(jnp.bfloat16)


def _head_kernel(x_ref, scale_ref, shift_ref, wh_ref, bias_ref, y_ref,
                 *, kd):
    for k in range(kd):
        s = _prep_slab(x_ref[0, k], scale_ref, shift_ref, True)
        yf = jnp.dot(
            s, wh_ref[:], preferred_element_type=jnp.float32
        ) + bias_ref[0, 0]
        y_ref[0, k] = yf.astype(y_ref.dtype)


def _head_bwd_kernel(x_ref, gy_ref, scale_ref, shift_ref, wht_ref,
                     dx_ref, dstats_ref, dwh_ref, dbias_ref, *, kd):
    j = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _():
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    @pl.when(j == 0)
    def _():
        dstats_ref[0] = jnp.zeros_like(dstats_ref[0])

    st = jnp.zeros((2, LANES), jnp.float32)
    db = None
    for k in range(kd):
        gy = gy_ref[0, k]                               # (rows, p*nc) bf16
        xs = x_ref[0, k].astype(jnp.float32)
        pre = xs * scale_ref[0, 0] + shift_ref[0, 0]
        s = jnp.maximum(pre, 0.0).astype(jnp.bfloat16)
        da = jnp.dot(gy, wht_ref[:], preferred_element_type=jnp.float32)
        dam = jnp.where(pre > 0, da, 0.0)
        dx_ref[0, k] = (dam * scale_ref[0, 0]).astype(dx_ref.dtype)
        st = st + jnp.stack([jnp.sum(dam * xs, 0), jnp.sum(dam, 0)])
        dwh_ref[:] += jax.lax.dot_general(
            s, gy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gsum = jnp.sum(gy.astype(jnp.float32), axis=0)
        db = gsum if db is None else db + gsum
    dstats_ref[0] += st
    dbias_ref[0] += db


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _head_vjp(xp, w, bias, scale, shift, meta, nc, interpret):
    h, u, c = meta
    b, d, rows, _ = xp.shape
    p = LANES // c
    wh = _head_wh(w, c, nc)
    bias_lane = jnp.tile(bias.astype(jnp.float32), p).reshape(1, 1, p * nc)
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    kd = _pick_kd(d, rows)
    return pl.pallas_call(
        functools.partial(_head_kernel, kd=kd),
        grid=(b, d // kd),
        in_specs=[
            pl.BlockSpec((1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p * nc), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kd, rows, p * nc),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, rows, p * nc), jnp.bfloat16,
                                       vma=vma),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, scale[:, None], shift[:, None], wh, bias_lane)


def _head_fwd(xp, w, bias, scale, shift, meta, nc, interpret):
    y = _head_vjp(xp, w, bias, scale, shift, meta, nc, interpret)
    return y, (xp, w, scale, shift)


def _head_bwd(meta, nc, interpret, res, gy):
    xp, w, scale, shift = res
    h, u, c = meta
    b, d, rows, _ = xp.shape
    p = LANES // c
    wht = _head_wh(w, c, nc).T
    vma = getattr(jax.typeof(xp), "vma", frozenset())
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    kd = _pick_kd(d, rows)
    dx, dstats, dwh, dbias_lane = pl.pallas_call(
        functools.partial(_head_bwd_kernel, kd=kd),
        grid=(b, d // kd),
        in_specs=[
            pl.BlockSpec((1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd, rows, p * nc), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((LANES, p * nc)),
            full((1, p * nc)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16,
                                 vma=vma),
            jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((LANES, p * nc), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, p * nc), jnp.float32, vma=vma),
        ),
        interpret=_interp(interpret),
        compiler_params=_compiler_params(),
    )(xp, gy.astype(jnp.bfloat16), scale[:, None], shift[:, None],
      wht.astype(jnp.bfloat16))
    dk = jnp.einsum(
        "ij,iajb->ab", jnp.eye(p, dtype=dwh.dtype),
        dwh.reshape(p, c, p, nc),
    )
    dw = dk.reshape(w.shape).astype(w.dtype)
    dbias = jnp.sum(dbias_lane.reshape(p, nc), axis=0)
    return (dx, dw, dbias.astype(jnp.float32),
            dstats[:, 0].astype(scale.dtype),
            dstats[:, 1].astype(shift.dtype))


_head_vjp.defvjp(_head_fwd, _head_bwd)


def fused_head_grid2(xp, w, bias, scale, shift, meta, num_classes,
                     interpret=None):
    """relu(xp*scale+shift) -> 1x1 head -> bf16 grid2, one kernel.

    Fused-act version of ``head1x1_grid2`` (same column placement; the
    trailing reshape stays a row-major bitcast because the kernel's
    (B, D, rows, P*NC) output is row-major, unlike the XLA dot's
    c-second layout which forced a relayout copy). Output is bf16 —
    devoxelize rounds its grid2 operand to bf16 either way."""
    h, u, c = meta
    b, d, rows, _ = xp.shape
    y = _head_vjp(xp, w, bias, scale, shift, (h, u, c), num_classes,
                  interpret)
    return y.reshape(b, d * h, u * (LANES // c) * num_classes)


def head1x1_packed(xp, w, bias, meta, num_classes):
    """1x1 conv on the packed form, channel-padded: returns f32
    (B, D, H, W, num_classes)."""
    h, u, c = meta
    b, d, rows, _ = xp.shape
    k = w.reshape(w.shape[-2], w.shape[-1])     # (C, NC)
    kpad = jnp.zeros((c, c), k.dtype).at[:, : k.shape[1]].set(k)
    p = LANES // c
    wh = jnp.einsum("ij,ab->iajb", jnp.eye(p, dtype=k.dtype), kpad).reshape(
        LANES, LANES
    ).astype(jnp.bfloat16)
    bpad = jnp.zeros((c,), jnp.float32).at[: bias.shape[0]].set(
        bias.astype(jnp.float32)
    )
    y = jax.lax.dot_general(
        xp, wh, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + _bias_lane(bpad, c)
    return y.reshape(b, d, h, u * p, c)[..., :num_classes]


def head1x1_grid2(xp, w, bias, meta, num_classes):
    """1x1 head emitted straight in devoxelize's "grid2" layout:
    (B, R*R, R*NC) f32, row-major (z, y | x, class).

    The lane placement rides the head matmul itself — column
    ``j*NC + cls`` of the (128, P*NC) weight holds ``k[:, cls]`` for
    sub-voxel ``j`` — so neither the 5-D (B, R, R, R, NC) grid nor the
    channel-pad slice of ``head1x1_packed`` materializes, and the
    backward is the transposed dot straight back into packed lanes
    (the 5-D hand-off cost a full-grid relayout copy each way in the
    r3 xplane profile). The trailing reshape is a row-major bitcast:
    (b, d, h*u, p*nc) -> (b, d*h, u*p*nc) with element order
    (x//p, x%p, cls) = (x, cls).
    """
    h, u, c = meta
    b, d, rows, _ = xp.shape
    nc = num_classes
    p = LANES // c
    k = w.reshape(w.shape[-2], w.shape[-1])                  # (C, NC)
    wh = jnp.einsum(
        "ij,ab->iajb", jnp.eye(p, dtype=k.dtype), k
    ).reshape(LANES, p * nc).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        xp, wh, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jnp.tile(bias.astype(jnp.float32), p)
    return y.reshape(b, d * h, u * p * nc)
