"""Per-event block-sparse submanifold 3^3 conv — no materialized halos.

The XLA formulation (ops/block_sparse.py ``block_subm_conv``) assembles a
(B, NT, (t+2)^3, C) halo per conv layer; the r5 HLO/xplane analysis
showed the assembly is lowered to 27 pad+maximum kLoop fusions writing
the 65 MB halo (~1.1 ms each at B8/NT64/C64) plus a train of layout
copies — ~10 ms/step of pure data movement at the bench config, for ANY
XLA halo variant (a one-hot MXU gather of the pieces measured within 2%
of the row-gather form because the concat write dominates).

This kernel never materializes a halo. One grid step = one event; the
event's occupied-tile set is VMEM-resident in the x-packed layout
(NT, t^2, t*C) — rows (tile, z, y), lanes (x, channel) — and the conv
decomposes into Mosaic-legal 2D matmuls only (the first r5 version
failed on real hardware: Mosaic rejects reshapes that merge a sublane
dim into lanes, and select(cond, scalar, scalar) one-hots crash the
compiler; every operand here is built at its final 2D shape, one-hots
are ``(iota == idx).astype(dtype)`` — the verified-legal pattern of
ops/pallas/onehot_contract.py):

- interior (reads stay in-tile): 9 row-shifted masked matmuls on the
  flat (NT*t^2, t*Cin) matrix against x-BANDED weight matrices
  (t*Cin, t*Cout) that fold the three dx taps of each (dz, dy) into
  one MXU pass (band entry [xi*Cin+ci, xo*Cout+co] = W[dz,dy,xi-xo]);
- boundary, classified by which tile axes the read crosses:
  * z/y faces: provider plane tables (prepared outside the kernel —
    XLA strided slices; in-kernel sub-tile folds would be illegal for
    bf16) gathered with an (NT*t, (NT+1)*t) one-hot built from the
    slot table via a placement matmul + iota compare, then 3
    perpendicular row-shifts x the same x-banded weights; accumulated
    into the consumer plane of the f32 scratch in-kernel;
  * x faces: same gather, y-banded weights; consumer lanes mismatch
    the packed layout, so they are separate kernel outputs assembled
    (and rounded once, with everything else) by XLA outside;
  * edges: line tables gathered with small (NT, NT+1) one-hots; the
    free-axis taps ride x-banded (in-kernel consumers) or y/z-banded
    weights (outside consumers);
  * corners: single-voxel tables, all 8 taps as one (NT, Cin) @
    (Cin, 8*Cout) stacked matmul, accumulated in-kernel.
  The decomposition reproduces the VALID conv on the halo bit-for-bit
  in f32 (each (site, tap, provider) pair lands in exactly one class).

Weights arrive as (27*Cin, Cout) with tap order d = (dz+1)*9 +
(dy+1)*3 + (dx+1) — the same (27, Cin, Cout) tap order as
``subm_conv_init`` flattened, so all sparse impls keep sharing
parameters. Banded forms are built outside per call (tiny einsums).

The custom VJP reuses the forward kernel for dgrad (transposed conv ==
the same structure with spatially flipped, C-transposed taps over the
SAME +delta slot table: slot_G(d)=H iff slot_H(-d)=G for kept tiles)
and a sibling wgrad kernel that contracts the same interior-shift /
boundary-gather operands against consumer cotangent slices into banded
M-matrices, whose shifted block-diagonal sums XLA extracts into dW
outside. Raw semantics (no bias, no active-mask select) — callers feed
the fused bias+LN kernel (ops/pallas/fused_ln.py), matching
``block_subm_conv(raw=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp(flag) -> bool:
    return jax.default_backend() != "tpu" if flag is None else bool(flag)


def fits_vmem(nt: int, t: int, cin: int, cout: int,
              itemsize: int = 2) -> bool:
    """Conservative VMEM-residency estimate across the three kernels
    (fwd, wgrad part 1/2) — the model gate falls back to the XLA halo
    path when a level's shapes don't fit."""
    tc, tco = t * cin, t * cout
    bands = 19 * tc * tco * itemsize + cin * 8 * cout * itemsize
    tables = (6 * (nt + 1) * t + 12 * (nt + 1)) * tc * itemsize \
        + 8 * (nt + 1) * cin * itemsize
    x = nt * t ** 3 * cin * itemsize
    temps = 3 * nt * t * t * max(tc, tco) * 4
    fwd = bands + tables + x + nt * t ** 3 * cout * (4 + itemsize) \
        + temps
    wg1 = 9 * tc * tco * 4 + tables + x \
        + nt * t ** 3 * cout * itemsize \
        + 4 * nt * t * tco * itemsize + temps
    wg2 = 10 * tc * tco * 4 + tables \
        + (2 * nt * t + 8 * nt) * tco * itemsize + temps
    budget = 95 * 1024 * 1024
    return max(fwd, wg1, wg2) <= budget


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _di(dz: int, dy: int, dx: int) -> int:
    """Tap/slot index in the canonical (dz, dy, dx)-major order."""
    return (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)


# boundary classification (axis order z=0, y=1, x=2); provider index on
# a crossed axis: +1 -> 0 (neighbor's near layer), -1 -> t-1; consumer:
# +1 -> t-1, -1 -> 0 (ops/block_sparse.py _provider_slice conventions)
FACES = [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]
EDGES = (
    [("x", dz, dy) for dz in (-1, 1) for dy in (-1, 1)]
    + [("y", dz, dx) for dz in (-1, 1) for dx in (-1, 1)]
    + [("z", dy, dx) for dy in (-1, 1) for dx in (-1, 1)]
)
CORNERS = [(dz, dy, dx)
           for dz in (-1, 1) for dy in (-1, 1) for dx in (-1, 1)]


def _prov(s: int, t: int) -> int:
    return 0 if s > 0 else t - 1


def _cons(s: int, t: int) -> int:
    return t - 1 if s > 0 else 0


def _k9(dz: int, dy: int) -> int:
    return (dz + 1) * 3 + (dy + 1)


def _k6(tz: int, sx: int) -> int:
    return (tz + 1) * 2 + (0 if sx < 0 else 1)


def _kz(dy: int, dx: int) -> int:
    return (0 if dy < 0 else 1) * 2 + (0 if dx < 0 else 1)


def _edge_d(e) -> tuple[int, int, int]:
    ax, a, b = e
    return {"x": (a, b, 0), "y": (a, 0, b), "z": (0, a, b)}[ax]


def _band(w3, taps, t: int):
    """(t*Cin, t*Cout) banded weight: entry [ui*Cin+ci, uo*Cout+co] =
    w3[taps[tau+1]][ci, co] where tau = ui - uo in (-1, 0, 1)."""
    cin, cout = w3.shape[1], w3.shape[2]
    u = jnp.arange(t)
    out = jnp.zeros((t, cin, t, cout), w3.dtype)
    for tau in (-1, 0, 1):
        e = (u[:, None] - u[None, :] == tau).astype(w3.dtype)
        out = out + jnp.einsum("ab,ij->aibj", e, w3[taps[tau + 1]])
    return out.reshape(t * cin, t * cout)


def _make_bands(w2, cin: int, cout: int, t: int):
    """wx9 (9, tC, tC'), wy6 (6, ...), wz4 (4, ...), wcs (Cin, 8*Cout)."""
    w3 = w2.reshape(27, cin, cout)
    wx9 = jnp.stack([
        _band(w3, [_di(dz, dy, tau) for tau in (-1, 0, 1)], t)
        for dz in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    wy6 = jnp.stack([
        _band(w3, [_di(tz, tau, sx) for tau in (-1, 0, 1)], t)
        for tz in (-1, 0, 1) for sx in (-1, 1)
    ])
    wz4 = jnp.stack([
        _band(w3, [_di(tau, dy, dx) for tau in (-1, 0, 1)], t)
        for dy in (-1, 1) for dx in (-1, 1)
    ])
    wcs = jnp.concatenate([w3[_di(*d)] for d in CORNERS], axis=1)
    return wx9, wy6, wz4, wcs


def _face_axes(a: int) -> tuple[int, int]:
    """(row free axis, lane free axis) of face-normal axis ``a``."""
    return {0: (1, 2), 1: (0, 2), 2: (0, 1)}[a]


def _make_tables(feats, t: int):
    """Provider tables, fully merged to their in-kernel 2D layouts.

    feats (B, NT, t^3, C) -> tblf (B, 6, (NT+1)*t, t*C) face planes,
    tble (B, 12, NT+1, t*C) edge lines, tblc (B, 8, NT+1, C) corner
    voxels; row/lane axis choices match the kernel's packed layout
    (rows z- then y-major, lanes x-major except x-faces/edges, which
    put their own free axis in lanes).
    """
    b, nt = feats.shape[:2]
    c = feats.shape[-1]
    x5 = feats.reshape(b, nt, t, t, t, c)
    xpad = jnp.concatenate(
        [jnp.zeros((b, 1, t, t, t, c), feats.dtype), x5], axis=1
    )
    tblf = []
    for a, s in FACES:
        idx = [slice(None)] * 3
        idx[a] = _prov(s, t)
        sl = xpad[(slice(None), slice(None), *idx)]   # (B, NT+1, t, t, C)
        tblf.append(sl.reshape(b, (nt + 1) * t, t * c))
    tble = []
    for e in EDGES:
        dz, dy, dx = _edge_d(e)
        idx = [slice(None)] * 3
        for ax, dd in ((0, dz), (1, dy), (2, dx)):
            if dd:
                idx[ax] = _prov(dd, t)
        sl = xpad[(slice(None), slice(None), *idx)]   # (B, NT+1, t, C)
        tble.append(sl.reshape(b, nt + 1, t * c))
    tblc = [
        xpad[:, :, _prov(dz, t), _prov(dy, t), _prov(dx, t), :]
        for dz, dy, dx in CORNERS
    ]
    return (jnp.stack(tblf, 1), jnp.stack(tble, 1), jnp.stack(tblc, 1))


def _shift_rows(m, k: int):
    """out[r] = m[r + k], zero-padded (static k)."""
    if k == 0:
        return m
    z = jnp.zeros((abs(k),) + m.shape[1:], m.dtype)
    if k > 0:
        return jnp.concatenate([m[k:], z], axis=0)
    return jnp.concatenate([z, m[:k]], axis=0)


def _zy_masked(op, dz: int, dy: int, nt: int, t: int):
    """Zero the rows of the shifted flat (NT*t^2, ...) matrix whose
    (z+dz, y+dy) read left the tile."""
    if dz == 0 and dy == 0:
        return op
    r = jax.lax.broadcasted_iota(jnp.int32, (nt * t * t, 1), 0)
    z, y = (r % (t * t)) // t, r % t
    m = jnp.ones_like(r, jnp.bool_)
    if dz:
        m = m & (z + dz >= 0) & (z + dz < t)
    if dy:
        m = m & (y + dy >= 0) & (y + dy < t)
    return jnp.where(m, op, jnp.zeros_like(op))


def _rho_masked(op, tau: int, nt: int, t: int):
    """Zero rows of the shifted (NT*t, ...) face matrix whose
    perpendicular coordinate rho+tau left the tile."""
    if tau == 0:
        return op
    r = jax.lax.broadcasted_iota(jnp.int32, (nt * t, 1), 0)
    rho = r % t
    m = (rho + tau >= 0) & (rho + tau < t)
    return jnp.where(m, op, jnp.zeros_like(op))


def _face_onehot(slots, di: int, nt: int, t: int, dt):
    """(NT*t, (NT+1)*t) one-hot A[r, q] = [q == (slot[r//t]+1)*t + r%t]
    — gathers per-tile row blocks from a zero-row-padded table. Built
    with the astype-compare + placement-matmul patterns (a scalar
    select here crashes the Mosaic compiler)."""
    rep = (jax.lax.broadcasted_iota(jnp.int32, (nt * t, nt), 0) // t
           == jax.lax.broadcasted_iota(jnp.int32, (nt * t, nt), 1)
           ).astype(jnp.float32)
    sc = slots[:, di:di + 1].astype(jnp.float32)
    srep = jax.lax.dot_general(
        rep, sc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (NT*t, 1)
    cols = (nt + 1) * t
    q = jax.lax.broadcasted_iota(jnp.int32, (nt * t, cols), 1)
    p = jax.lax.broadcasted_iota(jnp.int32, (nt * t, cols), 0) % t
    tgt = (srep + 1.0) * t + p.astype(jnp.float32)
    return (q.astype(jnp.float32) == tgt).astype(dt)


def _small_onehot(slots, di: int, nt: int, dt):
    """(NT, NT+1) one-hot onto the zero-padded tile axis."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (nt, nt + 1), 1)
    return (cols == slots[:, di:di + 1] + 1).astype(dt)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, slot_ref, wx_ref, wy_ref, wz_ref, wc_ref,
                tblf_ref, tble_ref, tblc_ref,
                y_ref, acc_ref,
                *, nt, t, cin, cout):
    t2 = t * t
    tc, tco = t * cin, t * cout
    xf = x_ref[0].reshape(nt * t2, tc)
    slots = slot_ref[0]
    dt = xf.dtype

    # ---- interior: 9 row-shifted masked matmuls vs x-banded weights
    acc_ref[...] = _mm(xf, wx_ref[_k9(0, 0)]).reshape(nt, t, t, tco)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dz == 0 and dy == 0:
                continue
            op = _zy_masked(_shift_rows(xf, dz * t + dy), dz, dy, nt, t)
            acc_ref[...] += _mm(op, wx_ref[_k9(dz, dy)]).reshape(
                nt, t, t, tco)

    # ---- faces: one-hot plane gather + 3 perpendicular shifts x bands
    for fi, (a, s) in enumerate(FACES):
        oh = _face_onehot(slots, _di(*[s if i == a else 0
                                       for i in range(3)]), nt, t, dt)
        g = _mm(oh, tblf_ref[0, fi]).astype(dt)         # (NT*t, t*Cin)
        contrib = jnp.zeros((nt * t, tco), jnp.float32)
        for tau in (-1, 0, 1):
            op = _rho_masked(_shift_rows(g, tau), tau, nt, t)
            if a == 0:
                band = wx_ref[_k9(s, tau)]
            elif a == 1:
                band = wx_ref[_k9(tau, s)]
            else:
                band = wy_ref[_k6(tau, s)]
            contrib = contrib + _mm(op, band)
        if a == 0:
            acc_ref[:, _cons(s, t), :, :] += contrib.reshape(nt, t, tco)
        elif a == 1:
            acc_ref[:, :, _cons(s, t), :] += contrib.reshape(nt, t, tco)
        else:
            # rows (n, z), lanes (y, C'): the consumer x-plane crosses
            # the packed lanes, so redistribute by per-y lane slices
            # (the first r5 shape emitted these as separate outputs —
            # the XLA-side assembly cost a full-grid layout copy +
            # convert per conv, ~1 ms/application in the step profile)
            xc = _cons(s, t)
            c3 = contrib.reshape(nt, t, tco)
            for y in range(t):
                acc_ref[:, :, y, xc * cout:(xc + 1) * cout] += \
                    c3[:, :, y * cout:(y + 1) * cout]

    # ---- edges: small one-hot line gather x banded weights
    for ei, e in enumerate(EDGES):
        ax, aa, bb = e
        d = _edge_d(e)
        oh = _small_onehot(slots, _di(*d), nt, dt)
        ge = _mm(oh, tble_ref[0, ei]).astype(dt)        # (NT, t*Cin)
        if ax == "x":
            ce = _mm(ge, wx_ref[_k9(aa, bb)])
            acc_ref[:, _cons(aa, t), _cons(bb, t), :] += ce
        elif ax == "y":
            ce = _mm(ge, wy_ref[_k6(aa, bb)])           # lanes (y, C')
            zc, xc = _cons(aa, t), _cons(bb, t)
            for y in range(t):
                acc_ref[:, zc, y, xc * cout:(xc + 1) * cout] += \
                    ce[:, y * cout:(y + 1) * cout]
        else:
            ce = _mm(ge, wz_ref[_kz(aa, bb)])           # lanes (z, C')
            yc, xc = _cons(aa, t), _cons(bb, t)
            for z in range(t):
                acc_ref[:, z, yc, xc * cout:(xc + 1) * cout] += \
                    ce[:, z * cout:(z + 1) * cout]

    # ---- corners: stacked single-voxel taps
    for k, d in enumerate(CORNERS):
        oh = _small_onehot(slots, _di(*d), nt, dt)
        gc = _mm(oh, tblc_ref[0, k]).astype(dt)         # (NT, Cin)
        cc = _mm(gc, wc_ref[:, k * cout:(k + 1) * cout])
        dz, dy, dx = d
        acc_ref[:, _cons(dz, t), _cons(dy, t),
                _cons(dx, t) * cout:(_cons(dx, t) + 1) * cout] += cc

    y_ref[0] = acc_ref[...].reshape(nt, t2, tco).astype(y_ref.dtype)


def _conv_call(feats, slots, w2, cout, interpret):
    """Raw halo-free conv. feats (B, NT, t^3, Cin) -> (B, NT, t^3, Cout)
    in feats.dtype (f32 accumulation throughout, rounded once)."""
    b, nt, t3, cin = feats.shape
    t = round(t3 ** (1 / 3))
    t2 = t * t
    tc, tco = t * cin, t * cout
    vma = getattr(jax.typeof(feats), "vma", frozenset())
    wx9, wy6, wz4, wcs = _make_bands(w2, cin, cout, t)
    tblf, tble, tblc = _make_tables(feats, t)
    x2 = feats.reshape(b, nt, t2, tc)

    kern = functools.partial(_fwd_kernel, nt=nt, t=t, cin=cin, cout=cout)
    ev = lambda i: (i, 0, 0)          # noqa: E731
    ev3 = lambda i: (i, 0, 0, 0)      # noqa: E731
    shared = lambda i: (0, 0, 0)      # noqa: E731
    y = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nt, t2, tc), ev3),
            pl.BlockSpec((1, nt, 27), ev),
            pl.BlockSpec((9, tc, tco), shared),
            pl.BlockSpec((6, tc, tco), shared),
            pl.BlockSpec((4, tc, tco), shared),
            pl.BlockSpec((cin, 8 * cout), lambda i: (0, 0)),
            pl.BlockSpec((1, 6, (nt + 1) * t, tc), ev3),
            pl.BlockSpec((1, 12, nt + 1, tc), ev3),
            pl.BlockSpec((1, 8, nt + 1, cin), ev3),
        ],
        out_specs=pl.BlockSpec((1, nt, t2, tco), ev3),
        out_shape=jax.ShapeDtypeStruct((b, nt, t2, tco), feats.dtype,
                                       vma=vma),
        scratch_shapes=[pltpu.VMEM((nt, t, t, tco), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(x2, slots, wx9.astype(feats.dtype), wy6.astype(feats.dtype),
      wz4.astype(feats.dtype), wcs.astype(feats.dtype), tblf, tble, tblc)
    return y.reshape(b, nt, t3, cout)


# ---------------------------------------------------------------------------
# wgrad: banded M-matrices, extracted into dW taps outside
# ---------------------------------------------------------------------------

def _rows_t(a, b2):
    return jax.lax.dot_general(
        a, b2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _wgrad9_kernel(x_ref, slot_ref, g_ref, tblf_ref, tble_ref,
                   gyf_ref, gye_ref, m9_ref,
                   *, nt, t, cin, cout):
    """x-banded M buckets: interior + z/y-face + x-free-edge pairs.

    The M outputs (constant index map) stay VMEM-resident across the
    event grid and accumulate directly (the onehot_contract.py
    reduction pattern); wgrad is split in two kernels so the 19 f32
    M-matrices never co-reside — one kernel blew the VMEM stack at
    Cin=128."""
    t2 = t * t
    tc, tco = t * cin, t * cout
    xf = x_ref[0].reshape(nt * t2, tc)
    gy = g_ref[0].reshape(nt * t2, tco)
    slots = slot_ref[0]
    dt = xf.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        m9_ref[:] = jnp.zeros_like(m9_ref)

    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            op = _zy_masked(_shift_rows(xf, dz * t + dy), dz, dy, nt, t)
            m9_ref[_k9(dz, dy)] += _rows_t(op, gy)

    for fi, (a, s) in enumerate(FACES[:4]):
        oh = _face_onehot(slots, _di(*[s if i == a else 0
                                       for i in range(3)]), nt, t, dt)
        g2 = _mm(oh, tblf_ref[0, fi]).astype(dt)
        gyp = gyf_ref[0, fi]                            # (NT*t, t*Cout)
        for tau in (-1, 0, 1):
            op = _rho_masked(_shift_rows(g2, tau), tau, nt, t)
            m = _rows_t(op, gyp)
            if a == 0:
                m9_ref[_k9(s, tau)] += m
            else:
                m9_ref[_k9(tau, s)] += m

    for ei, e in enumerate(EDGES[:4]):                  # x-free edges
        _, aa, bb = e
        oh = _small_onehot(slots, _di(*_edge_d(e)), nt, dt)
        ge = _mm(oh, tble_ref[0, ei]).astype(dt)
        m9_ref[_k9(aa, bb)] += _rows_t(ge, gye_ref[0, ei])


def _wgradb_kernel(slot_ref, tblf_ref, tble_ref, tblc_ref,
                   gyf_ref, gye_ref, gyc_ref,
                   my_ref, mz_ref, dwc_ref,
                   *, nt, t, cin, cout):
    """y/z-banded M buckets + corner taps: x-face, y/z-free-edge and
    corner pairs (none of these need the full x/gy blocks)."""
    slots = slot_ref[0]
    dt = tblf_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        my_ref[:] = jnp.zeros_like(my_ref)
        mz_ref[:] = jnp.zeros_like(mz_ref)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)

    for fi, (a, s) in enumerate(FACES[4:]):             # x-faces
        oh = _face_onehot(slots, _di(0, 0, s), nt, t, dt)
        g2 = _mm(oh, tblf_ref[0, fi]).astype(dt)
        gyp = gyf_ref[0, fi]                            # lanes (y, C')
        for tau in (-1, 0, 1):
            op = _rho_masked(_shift_rows(g2, tau), tau, nt, t)
            my_ref[_k6(tau, s)] += _rows_t(op, gyp)

    for ei, e in enumerate(EDGES[4:]):                  # y/z-free edges
        ax, aa, bb = e
        oh = _small_onehot(slots, _di(*_edge_d(e)), nt, dt)
        ge = _mm(oh, tble_ref[0, ei]).astype(dt)
        m = _rows_t(ge, gye_ref[0, ei])
        if ax == "y":
            my_ref[_k6(aa, bb)] += m
        else:
            mz_ref[_kz(aa, bb)] += m

    for k, d in enumerate(CORNERS):
        oh = _small_onehot(slots, _di(*d), nt, dt)
        gc = _mm(oh, tblc_ref[0, k]).astype(dt)
        dwc_ref[:, k * cout:(k + 1) * cout] += _rows_t(gc, gyc_ref[0, k])


def _gy_tables(g, t: int):
    """Consumer cotangent slices matching each boundary class's gathered
    operand rows/lanes. g (B, NT, t^3, Cout)."""
    b, nt = g.shape[:2]
    cout = g.shape[-1]
    g5 = g.reshape(b, nt, t, t, t, cout)
    gyf = []
    for a, s in FACES:
        idx = [slice(None)] * 3
        idx[a] = _cons(s, t)
        sl = g5[(slice(None), slice(None), *idx)]       # (B, NT, t, t, C')
        gyf.append(sl.reshape(b, nt * t, t * cout))
    gye = []
    for e in EDGES:
        dz, dy, dx = _edge_d(e)
        idx = [slice(None)] * 3
        for ax, dd in ((0, dz), (1, dy), (2, dx)):
            if dd:
                idx[ax] = _cons(dd, t)
        sl = g5[(slice(None), slice(None), *idx)]       # (B, NT, t, C')
        gye.append(sl.reshape(b, nt, t * cout))
    gyc = [
        g5[:, :, _cons(dz, t), _cons(dy, t), _cons(dx, t), :]
        for dz, dy, dx in CORNERS
    ]
    return jnp.stack(gyf, 1), jnp.stack(gye, 1), jnp.stack(gyc, 1)


def _extract_band(m, tau: int, t: int, cin: int, cout: int):
    """Sum the tau-shifted block diagonal of an (t*Cin, t*Cout) M."""
    m4 = m.reshape(t, cin, t, cout)
    if tau == 0:
        return jnp.einsum("acad->cd", m4)
    if tau > 0:
        return jnp.einsum("acad->cd", m4[tau:, :, :t - tau, :])
    return jnp.einsum("acad->cd", m4[:t + tau, :, -tau:, :])


def _wgrad_call(feats, slots, g, interpret):
    b, nt, t3, cin = feats.shape
    cout = g.shape[-1]
    t = round(t3 ** (1 / 3))
    t2 = t * t
    tc, tco = t * cin, t * cout
    vma = getattr(jax.typeof(feats), "vma", frozenset())
    tblf, tble, tblc = _make_tables(feats, t)
    gyf, gye, gyc = _gy_tables(g, t)
    x2 = feats.reshape(b, nt, t2, tc)
    g2 = g.reshape(b, nt, t2, tco)

    ev = lambda i: (i, 0, 0)          # noqa: E731
    ev3 = lambda i: (i, 0, 0, 0)      # noqa: E731
    m9 = pl.pallas_call(
        functools.partial(_wgrad9_kernel, nt=nt, t=t, cin=cin,
                          cout=cout),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nt, t2, tc), ev3),
            pl.BlockSpec((1, nt, 27), ev),
            pl.BlockSpec((1, nt, t2, tco), ev3),
            pl.BlockSpec((1, 4, (nt + 1) * t, tc), ev3),
            pl.BlockSpec((1, 4, nt + 1, tc), ev3),
            pl.BlockSpec((1, 4, nt * t, tco), ev3),
            pl.BlockSpec((1, 4, nt, tco), ev3),
        ],
        out_specs=pl.BlockSpec((9, tc, tco), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, tc, tco), jnp.float32,
                                       vma=vma),
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(x2, slots, g2, tblf[:, :4], tble[:, :4], gyf[:, :4], gye[:, :4])
    my6, mz4, dwc = pl.pallas_call(
        functools.partial(_wgradb_kernel, nt=nt, t=t, cin=cin,
                          cout=cout),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nt, 27), ev),
            pl.BlockSpec((1, 2, (nt + 1) * t, tc), ev3),
            pl.BlockSpec((1, 8, nt + 1, tc), ev3),
            pl.BlockSpec((1, 8, nt + 1, cin), ev3),
            pl.BlockSpec((1, 2, nt * t, tco), ev3),
            pl.BlockSpec((1, 8, nt, tco), ev3),
            pl.BlockSpec((1, 8, nt, cout), ev3),
        ],
        out_specs=[
            pl.BlockSpec((6, tc, tco), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, tc, tco), lambda i: (0, 0, 0)),
            pl.BlockSpec((cin, 8 * cout), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, tc, tco), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((4, tc, tco), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((cin, 8 * cout), jnp.float32, vma=vma),
        ],
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(slots, tblf[:, 4:], tble[:, 4:], tblc, gyf[:, 4:], gye[:, 4:], gyc)

    dw = jnp.zeros((27, cin, cout), jnp.float32)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for tau in (-1, 0, 1):
                dw = dw.at[_di(dz, dy, tau)].add(
                    _extract_band(m9[_k9(dz, dy)], tau, t, cin, cout))
    for tz in (-1, 0, 1):
        for sx in (-1, 1):
            for tau in (-1, 0, 1):
                dw = dw.at[_di(tz, tau, sx)].add(
                    _extract_band(my6[_k6(tz, sx)], tau, t, cin, cout))
    for dy in (-1, 1):
        for dx in (-1, 1):
            for tau in (-1, 0, 1):
                dw = dw.at[_di(tau, dy, dx)].add(
                    _extract_band(mz4[_kz(dy, dx)], tau, t, cin, cout))
    for k, d in enumerate(CORNERS):
        dw = dw.at[_di(*d)].add(dwc[:, k * cout:(k + 1) * cout])
    return dw.reshape(27 * cin, cout)


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
