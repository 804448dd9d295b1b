"""Per-event block-sparse submanifold 3^3 conv — no materialized halos.

The XLA formulation (ops/block_sparse.py ``block_subm_conv``) assembles a
(B, NT, (t+2)^3, C) halo per conv layer; the r5 HLO/xplane analysis
showed the assembly is lowered to 27 pad+maximum kLoop fusions writing
the 65 MB halo (~1.1 ms each at B8/NT64/C64) plus a train of layout
copies — ~10 ms/step of pure data movement at the bench config, for ANY
XLA halo variant (a one-hot MXU gather of the pieces measured within 2%
of the row-gather form because the concat write dominates).

This kernel never materializes a halo. One grid step = one event; the
event's whole occupied-tile set (NT x t^3 x C, ~4 MB at the bench
config) is VMEM-resident, and the conv decomposes exactly as:

- interior: all taps whose read stays inside the same tile — 27
  row-shifted masked matmuls on the flat (NT*t^3, C) matrix (the shift
  crosses tile boundaries, the periodic intra-coordinate mask zeroes
  exactly those rows);
- boundary: for each of the 26 neighbor deltas, the provider sub-block
  (face t^2 / edge t / corner 1 voxel columns) is gathered from the
  zero-padded tile table with a (NT, NT+1) one-hot MXU contraction
  (slot table from ``_neighbor_slots``; unit rows make the gather exact
  in bf16), then convolved over its FREE axes only (a face feeds the
  3x3 sub-kernel over its two in-plane axes, an edge a 3-tap line, a
  corner a single tap) and accumulated into the consumer face/edge/
  corner of the f32 output scratch. Out-of-range free-axis reads belong
  to OTHER deltas' blocks, so zero-padding is exact — the decomposition
  reproduces the VALID conv on the halo bit-for-bit in f32.

Weights arrive as (27*Cin, Cout) with tap order d = (dz+1)*9 +
(dy+1)*3 + (dx+1) — the same (27, Cin, Cout) tap order as
``subm_conv_init`` flattened, so all sparse impls keep sharing
parameters.

The custom VJP reuses the forward kernel for dgrad (transposed conv ==
the same structure with spatially flipped, C-transposed taps over the
SAME +delta slot table: slot_G(d)=H iff slot_H(-d)=G for kept tiles)
and a sibling kernel for wgrad (per-tap operand^T @ cotangent with the
same interior-shift / boundary-gather operands). Raw semantics (no bias, no active-mask select) — callers
feed the fused bias+LN kernel (ops/pallas/fused_ln.py), matching
``block_subm_conv(raw=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DELTAS = [
    (dz, dy, dx)
    for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
]


def _interp(flag) -> bool:
    return jax.default_backend() != "tpu" if flag is None else bool(flag)


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _shift_rows(m, k: int):
    """out[r] = m[r + k], zero-padded (static k)."""
    if k == 0:
        return m
    z = jnp.zeros((abs(k),) + m.shape[1:], m.dtype)
    if k > 0:
        return jnp.concatenate([m[k:], z], axis=0)
    return jnp.concatenate([z, m[:k]], axis=0)


def _intra_coords(nt: int, t: int):
    """(NT*t^3, 1) int32 zi/yi/xi of each flat row (periodic in t^3)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (nt * t * t * t, 1), 0)
    intra = r % (t * t * t)
    return intra // (t * t), (intra // t) % t, intra % t


def _tap_mask(zi, yi, xi, d, t):
    """1.0 where the read site (zi+dz, yi+dy, xi+dx) stays in-tile."""
    dz, dy, dx = d

    def ok(c, dc):
        if dc == 0:
            return None
        return (c + dc >= 0) & (c + dc < t)

    conds = [m for m in (ok(zi, dz), ok(yi, dy), ok(xi, dx)) if m is not None]
    if not conds:
        return None
    acc = conds[0]
    for m in conds[1:]:
        acc = acc & m
    return acc


def _provider_slice(t: int, d: int) -> slice:
    return {-1: slice(t - 1, t), 0: slice(0, t), 1: slice(0, 1)}[d]


def _consumer_index(t: int, d: int):
    """Output region (per axis) that reads the delta-d provider block."""
    return {-1: 0, 0: slice(0, t), 1: t - 1}[d]


def _free_taps(d):
    """Taps applied to the delta-d block: clamped axes use d's own
    component, free axes range over -1/0/1."""
    def rng(dc):
        return (-1, 0, 1) if dc == 0 else (dc,)

    dz, dy, dx = d
    return [
        (tz, ty, tx)
        for tz in rng(dz) for ty in rng(dy) for tx in rng(dx)
    ]


def _tap_row(tap) -> int:
    tz, ty, tx = tap
    return (tz + 1) * 9 + (ty + 1) * 3 + (tx + 1)


def _block_shift_mask(g2, sdims, tap, d, t):
    """Shift+mask the flattened free axes of a gathered block.

    g2: (NT*prod(sdims), C) rows in (z, y, x)-major order over the
    block's own extent ``sdims``; ``tap`` moves only along free axes
    (clamped axes have extent 1). Returns the shifted operand with
    out-of-block reads zeroed (they belong to other deltas' blocks)."""
    sz, sy, sx = sdims
    off = tap[0] * (d[0] == 0) * sy * sx + tap[1] * (d[1] == 0) * sx \
        + tap[2] * (d[2] == 0)
    sh = _shift_rows(g2, off)
    rows = g2.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    blk = r % (sz * sy * sx)
    bz, by, bx = blk // (sy * sx), (blk // sx) % sy, blk % sx
    conds = []
    if d[0] == 0 and tap[0]:
        conds.append((bz + tap[0] >= 0) & (bz + tap[0] < sz))
    if d[1] == 0 and tap[1]:
        conds.append((by + tap[1] >= 0) & (by + tap[1] < sy))
    if d[2] == 0 and tap[2]:
        conds.append((bx + tap[2] >= 0) & (bx + tap[2] < sx))
    if not conds:
        return sh
    acc = conds[0]
    for m in conds[1:]:
        acc = acc & m
    return jnp.where(acc, sh, jnp.zeros_like(sh))


def _fwd_kernel(x_ref, slot_ref, w_ref, y_ref, acc_ref,
                *, nt, t, cin, cout):
    t3 = t * t * t
    x = x_ref[0]                                   # (NT, t^3, C)
    xf = x.reshape(nt * t3, cin)
    slots = slot_ref[0]                            # (NT, 27) int32

    # ---- interior: 27 shifted masked matmuls on the flat matrix
    zi, yi, xi = _intra_coords(nt, t)
    acc = jnp.zeros((nt * t3, cout), jnp.float32)
    for di, d in enumerate(DELTAS):
        off = d[0] * t * t + d[1] * t + d[2]
        op = _shift_rows(xf, off)
        m = _tap_mask(zi, yi, xi, d, t)
        if m is not None:
            op = jnp.where(m, op, jnp.zeros_like(op))
        acc = acc + jnp.dot(
            op, w_ref[di * cin:(di + 1) * cin, :],
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc.reshape(nt, t, t, t, cout)

    # ---- boundary: one-hot gather per delta + free-axis taps
    xpad = jnp.concatenate(
        [jnp.zeros((1, t3, cin), x.dtype), x], axis=0
    ).reshape(nt + 1, t, t, t, cin)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nt, nt + 1), 1)
    for di, d in enumerate(DELTAS):
        if d == (0, 0, 0):
            continue
        psl = (_provider_slice(t, d[0]), _provider_slice(t, d[1]),
               _provider_slice(t, d[2]))
        sdims = tuple(sl.stop - sl.start for sl in psl)
        sub = sdims[0] * sdims[1] * sdims[2]
        tbl = xpad[:, psl[0], psl[1], psl[2], :].reshape(nt + 1, sub * cin)
        oh = jnp.where(
            cols == (slots[:, di:di + 1] + 1), 1.0, 0.0
        ).astype(x.dtype)
        g2 = jnp.dot(
            oh, tbl, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(nt * sub, cin)
        contrib = jnp.zeros((nt * sub, cout), jnp.float32)
        for tap in _free_taps(d):
            op = _block_shift_mask(g2, sdims, tap, d, t)
            ti = _tap_row(tap)
            contrib = contrib + jnp.dot(
                op, w_ref[ti * cin:(ti + 1) * cin, :],
                preferred_element_type=jnp.float32,
            )
        ci = (slice(None),
              _consumer_index(t, d[0]),
              _consumer_index(t, d[1]),
              _consumer_index(t, d[2]),
              slice(None))
        cur = acc_ref[ci]
        acc_ref[ci] = cur + contrib.reshape(cur.shape)

    y_ref[0] = acc_ref[:].reshape(nt, t3, cout).astype(y_ref.dtype)


def _wgrad_kernel(x_ref, slot_ref, g_ref, dw_ref, dwacc_ref,
                  *, nt, t, cin, cout):
    """dW[tap] += operand(tap)^T @ dY — the same interior-shift and
    boundary-gather operands as the forward, contracted over rows.
    Accumulated across the event grid dimension in an f32 scratch."""
    t3 = t * t * t
    x = x_ref[0]
    g = g_ref[0].reshape(nt * t3, cout)            # dY
    xf = x.reshape(nt * t3, cin)
    slots = slot_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)

    zi, yi, xi = _intra_coords(nt, t)
    for di, d in enumerate(DELTAS):
        off = d[0] * t * t + d[1] * t + d[2]
        op = _shift_rows(xf, off)
        m = _tap_mask(zi, yi, xi, d, t)
        if m is not None:
            op = jnp.where(m, op, jnp.zeros_like(op))
        dwacc_ref[di * cin:(di + 1) * cin, :] += jax.lax.dot_general(
            op, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xpad = jnp.concatenate(
        [jnp.zeros((1, t3, cin), x.dtype), x], axis=0
    ).reshape(nt + 1, t, t, t, cin)
    g5 = g.reshape(nt, t, t, t, cout)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nt, nt + 1), 1)
    for di, d in enumerate(DELTAS):
        if d == (0, 0, 0):
            continue
        psl = (_provider_slice(t, d[0]), _provider_slice(t, d[1]),
               _provider_slice(t, d[2]))
        sdims = tuple(sl.stop - sl.start for sl in psl)
        sub = sdims[0] * sdims[1] * sdims[2]
        tbl = xpad[:, psl[0], psl[1], psl[2], :].reshape(nt + 1, sub * cin)
        oh = jnp.where(
            cols == (slots[:, di:di + 1] + 1), 1.0, 0.0
        ).astype(x.dtype)
        g2 = jnp.dot(
            oh, tbl, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(nt * sub, cin)
        ci = (slice(None),
              _consumer_index(t, d[0]),
              _consumer_index(t, d[1]),
              _consumer_index(t, d[2]),
              slice(None))
        gy = g5[ci].reshape(nt * sub, cout)
        for tap in _free_taps(d):
            op = _block_shift_mask(g2, sdims, tap, d, t)
            ti = _tap_row(tap)
            dwacc_ref[ti * cin:(ti + 1) * cin, :] += jax.lax.dot_general(
                op, gy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dwacc_ref[:]


def _conv_call(feats, slots, w2, cout, interpret):
    b, nt, t3, cin = feats.shape
    t = round(t3 ** (1 / 3))
    vma = getattr(jax.typeof(feats), "vma", frozenset())
    kern = functools.partial(_fwd_kernel, nt=nt, t=t, cin=cin, cout=cout)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nt, t3, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, 27), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nt, t3, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt, t3, cout), feats.dtype,
                                       vma=vma),
        scratch_shapes=[pltpu.VMEM((nt, t, t, t, cout), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(feats, slots, w2)


def _wgrad_call(feats, slots, g, interpret):
    b, nt, t3, cin = feats.shape
    cout = g.shape[-1]
    t = round(t3 ** (1 / 3))
    vma = getattr(jax.typeof(feats), "vma", frozenset())
    kern = functools.partial(_wgrad_kernel, nt=nt, t=t, cin=cin, cout=cout)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nt, t3, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, 27), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, t3, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27 * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27 * cin, cout), jnp.float32,
                                       vma=vma),
        scratch_shapes=[pltpu.VMEM((27 * cin, cout), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(feats, slots, g)


def _flip_w2(w2, cin, cout):
    """w2 (27*Cin, Cout) -> transposed-conv weights (27*Cout, Cin):
    tap d takes W[-d]^T (spatial flip + channel transpose)."""
    w = w2.reshape(27, cin, cout)
    wt = jnp.transpose(w[::-1], (0, 2, 1))   # reversed tap order == -d
    return wt.reshape(27 * cout, cin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def block_conv(feats, slots, w2, interpret: bool | None = None):
    """Raw submanifold 3^3 conv on occupied tiles, halo-free.

    feats: (B, NT, t^3, C) (z-major intra rows); slots: (B, NT, 27)
    int32 +delta neighbor table (ops/block_sparse._neighbor_slots(+1));
    w2: (27*Cin, Cout). Returns (B, NT, t^3, Cout) in feats.dtype — no
    bias, no active-mask (the fused LN kernel applies both). The slot
    table gradient is zero-tangent (int32). The transpose conv in the
    VJP uses the SAME table: slot_G(d)=H iff slot_H(-d)=G for kept
    tiles, so the dY-halo conv with spatially flipped, C-transposed
    taps is the exact adjoint."""
    return _conv_call(feats, slots, w2, w2.shape[-1], interpret)


def _block_conv_fwd(feats, slots, w2, interpret):
    out = _conv_call(feats, slots, w2, w2.shape[-1], interpret)
    return out, (feats, slots, w2)


def _block_conv_bwd(interpret, res, g):
    import numpy as np

    feats, slots, w2 = res
    cin = feats.shape[-1]
    cout = w2.shape[-1]
    # dgrad: transposed conv == same kernel, flipped weights, same slots
    dx = _conv_call(
        g.astype(feats.dtype), slots, _flip_w2(w2, cin, cout),
        cin, interpret,
    )
    dw = _wgrad_call(feats, slots, g.astype(feats.dtype), interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return dx, f0(slots), dw.astype(w2.dtype)


block_conv.defvjp(_block_conv_fwd, _block_conv_bwd)
