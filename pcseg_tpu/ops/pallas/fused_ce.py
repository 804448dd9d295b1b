"""Fused [seg3-normalize -> ReLU -> seg4 matmul -> weighted CE + accuracy]
kernel — the classifier layer and the loss in ONE Pallas op.

Round-3 PointNet roofline work (VERDICT r2 #1): the final logits layer is
C=num_classes wide (4 for the reference data), so every XLA op that
touches the (N, C) logits — log_softmax, one-hot contractions for the
weighted CE (ops/losses.py cross_entropy_sums), argmax accuracy — runs at
C/128 lane efficiency, and seg4's own (128, C) matmul uses C/128 of the
MXU. This op pads the classifier to 128 lanes ONCE (the MXU does a
128-wide matmul either way), computes the row-wise log-sum-exp, the
weighted-CE partial sums (num = sum_i w[y_i]*nll_i, den = sum_i w[y_i] —
exactly ``cross_entropy_sums``'s contract, matching
``nn.CrossEntropyLoss(ignore_index=-1, weight=w)``, pcs.py:216), and the
argmax-correct count inside the kernel, and never materializes logits in
HBM at all.

Backward (custom VJP): only ``num`` depends on the inputs
(``dden/dx = 0``; ``correct`` is a count). The backward kernel recomputes
the prologue + logits tile and seeds the classic softmax gradient
``dlogits = ct_num * w[y] * (softmax - onehot)`` directly into the
seg4 backward (dW, db, dx, dgamma/dbeta stat terms) — one kernel where
the unfused path ran a seg4 forward + XLA CE forward + XLA CE backward +
seg4 backward kernel.

Semantics note: rows with label < 0 (padding, the reference's
ignore_index=-1, pcs.py:54/:216) contribute nothing to num/den/correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NEG = -1.0e30


def _prologue(x, mu_ref, inv_ref, gamma_ref, beta_ref):
    xf = x.astype(jnp.float32)
    x_hat = (xf - mu_ref[0]) * inv_ref[0]
    z = x_hat * gamma_ref[0] + beta_ref[0]
    return x_hat, jnp.maximum(z, 0.0)


def _logits_tile(a, w_ref, b_ref, lane_valid):
    y = jax.lax.dot_general(
        a, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0]
    return jnp.where(lane_valid, y, NEG)


def _colsum(v, exact=True):
    """Per-row lane sum as an MXU dot: (t, LANES) -> (t, 8)[:, :1].

    A VPU lane reduction is ~log2(128)=7 full-width shuffle passes; the
    profiler showed five of them made this kernel ~10x its HBM+MXU floor
    (experiments/profile_steps.py, r3). One (t,128)@(128,8) dot is MXU
    noise instead.

    Mosaic's default (and only supported) MXU pass rounds f32 operands
    to bf16, which broke the ``tl == mx`` argmax equality and cost ~3
    decimal digits of the loss. ``exact=True`` therefore splits the
    operand bf16-hi/lo and sums two dots (~16 mantissa bits; both halves
    are exactly representable, so each dot is exact). Pass exact=False
    for integer-valued summands <= 2^8 (one-hot counts), which a single
    bf16 pass already represents exactly."""
    ones = jnp.ones((LANES, 8), jnp.float32)

    def dot(a):
        return jax.lax.dot_general(
            a, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if not exact:
        return dot(v)[:, :1]
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    return (dot(hi) + dot(v - hi))[:, :1]


def _strict_lower():
    """TRI[c, j] = 1.0 iff c < j — dot(att, TRI)[r, j] counts attaining
    lanes strictly before lane j (the torch first-lane argmax tie rule,
    moved onto the MXU)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (r < cc).astype(jnp.float32)


def _fwd_kernel(x_ref, mu_ref, inv_ref, gamma_ref, beta_ref, w_ref, b_ref,
                lab_ref, cw_ref, acc_ref, *, num_classes: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # half-split like fused_block: lets the second half's prologue/CE
    # VPU work overlap the first half's matmul on the MXU
    tile = x_ref.shape[0]
    nh = 2 if tile % 2 == 0 else 1
    t = tile // nh
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    tri = _strict_lower()
    for h in range(nh):
        sl = slice(h * t, (h + 1) * t)
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, LANES), 1)
        lane_valid = lane < num_classes

        _, zr = _prologue(
            x_ref[sl], mu_ref, inv_ref, gamma_ref, beta_ref
        )
        a = zr.astype(w_ref.dtype)
        logits = _logits_tile(a, w_ref, b_ref, lane_valid)

        lab = lab_ref[sl]                              # (t, 1) int32
        valid = (lab >= 0).astype(jnp.float32)         # (t, 1)
        onehot = (lab == lane).astype(jnp.float32)     # (t, LANES)

        # the ONLY remaining VPU lane reduction: the row max (needed for
        # exp stability AND argmax); everything else rides _colsum dots
        mx = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - mx)                      # invalid lanes -> 0
        att = (logits >= mx).astype(jnp.float32)       # lanes at the max

        se = _colsum(ex)
        true_logit = _colsum(onehot * logits)
        wrow = _colsum(onehot * cw_ref[0]) * valid
        # argmax == label iff the label lane attains the max AND no lane
        # strictly before it does (torch first-lane tie rule). Both sums
        # are small integers — exact in the fast bf16 MXU pass.
        att_lab = _colsum(onehot * att, exact=False)
        nbefore = jax.lax.dot_general(
            att, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        before_lab = _colsum(onehot * nbefore, exact=False)

        lse = jnp.log(se) + mx
        num_t = jnp.sum(wrow * (lse - true_logit))
        den_t = jnp.sum(wrow)
        correct_t = jnp.sum(
            valid
            * (att_lab > 0.5).astype(jnp.float32)
            * (before_lab == 0.0).astype(jnp.float32)
        )

        acc_ref[:] += (
            jnp.where(out_lane == 0, num_t, 0.0)
            + jnp.where(out_lane == 1, den_t, 0.0)
            + jnp.where(out_lane == 2, correct_t, 0.0)
        )


def _bwd_kernel(x_ref, mu_ref, inv_ref, gamma_ref, beta_ref, w_ref, b_ref,
                lab_ref, cw_ref, ct_ref,
                dx_ref, dw_ref, db_ref, dg_ref, dbta_ref,
                *, num_classes: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbta_ref[:] = jnp.zeros_like(dbta_ref)

    tile = x_ref.shape[0]
    nh = 2 if tile % 2 == 0 else 1
    t = tile // nh
    for h in range(nh):
        sl = slice(h * t, (h + 1) * t)
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, LANES), 1)
        lane_valid = lane < num_classes

        x_hat, zr = _prologue(
            x_ref[sl], mu_ref, inv_ref, gamma_ref, beta_ref
        )
        a = zr.astype(w_ref.dtype)
        logits = _logits_tile(a, w_ref, b_ref, lane_valid)

        lab = lab_ref[sl]
        valid = (lab >= 0).astype(jnp.float32)
        onehot = (lab == lane).astype(jnp.float32)
        wrow = _colsum(onehot * cw_ref[0]) * valid

        mx = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - mx)
        p = ex / _colsum(ex)
        # padded lanes: p ~ 0 and onehot = 0 -> dlogits 0 there
        dlogits = (ct_ref[0] * wrow) * (p - onehot)

        dl_b = dlogits.astype(w_ref.dtype)
        dw_ref[:] += jax.lax.dot_general(
            a, dl_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[:] += jnp.sum(dlogits, axis=0, keepdims=True)

        da = jax.lax.dot_general(
            dl_b, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz = da * (zr > 0.0).astype(jnp.float32)
        dg_ref[:] += jnp.sum(dz * x_hat, axis=0, keepdims=True)
        dbta_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
        dx_ref[sl] = (dz * gamma_ref[0] * inv_ref[0]).astype(dx_ref.dtype)


def _specs(tile, cin, with_ct):
    def vspec(shape, index_map=None):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    in_specs = [
        vspec((tile, cin), lambda i: (i, 0)),    # x
        vspec((1, cin), lambda i: (0, 0)),       # mu
        vspec((1, cin), lambda i: (0, 0)),       # inv
        vspec((1, cin), lambda i: (0, 0)),       # gamma
        vspec((1, cin), lambda i: (0, 0)),       # beta
        vspec((cin, LANES), lambda i: (0, 0)),   # w (lane-padded)
        vspec((1, LANES), lambda i: (0, 0)),     # b (lane-padded)
        vspec((tile, 1), lambda i: (i, 0)),      # labels
        vspec((1, LANES), lambda i: (0, 0)),     # class weights (padded)
    ]
    if with_ct:
        in_specs.append(vspec((1, 1), lambda i: (0, 0)))  # ct_num
    return in_specs, vspec


def _pad_lanes(v, fill=0.0):
    c = v.shape[-1]
    return jnp.pad(v.reshape(1, c), ((0, 0), (0, LANES - c)),
                   constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_seg4_ce(x, mu, inv, gamma, beta, w, b, labels, class_weights,
                  num_classes: int, tile: int = 1024):
    """(num, den, correct) of the weighted masked CE over the classifier.

    x: (N, Cin) raw pre-norm seg3 output (bf16); mu/inv/gamma/beta:
    (Cin,) seg3 batch-norm terms; w: (Cin, C); b: (C,);
    labels: (N,) int32 with -1 padding; class_weights: (C,) f32.
    Returns three f32 scalars: num = sum w[y]*nll, den = sum w[y],
    correct = count(argmax == y on valid rows) — the exact contracts of
    ``cross_entropy_sums`` (ops/losses.py) and ``masked_accuracy``
    restricted to label-valid rows (identical to the mask under the
    framework's labels==-1 padding convention).
    """
    return _fwd_call(x, mu, inv, gamma, beta, w, b, labels, class_weights,
                     num_classes, tile)


def _fwd_call(x, mu, inv, gamma, beta, w, b, labels, class_weights,
              num_classes, tile):
    n, cin = x.shape
    vma = getattr(jax.typeof(x), "vma", frozenset())
    in_specs, vspec = _specs(tile, cin, with_ct=False)
    wpad = jnp.pad(w.astype(x.dtype), ((0, 0), (0, LANES - w.shape[1])))
    acc = pl.pallas_call(
        functools.partial(_fwd_kernel, num_classes=num_classes),
        grid=(pl.cdiv(n, tile),),
        in_specs=in_specs,
        out_specs=vspec((1, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32, vma=vma),
        interpret=jax.default_backend() != "tpu",
    )(
        x, mu.reshape(1, cin), inv.reshape(1, cin),
        gamma.reshape(1, cin), beta.reshape(1, cin),
        wpad, _pad_lanes(b), labels.reshape(n, 1).astype(jnp.int32),
        _pad_lanes(class_weights),
    )
    return acc[0, 0], acc[0, 1], acc[0, 2]


def _ce_fwd(x, mu, inv, gamma, beta, w, b, labels, class_weights,
            num_classes, tile):
    out = _fwd_call(x, mu, inv, gamma, beta, w, b, labels, class_weights,
                    num_classes, tile)
    return out, (x, mu, inv, gamma, beta, w, b, labels, class_weights)


def _ce_bwd(num_classes, tile, res, ct):
    x, mu, inv, gamma, beta, w, b, labels, class_weights = res
    ct_num = ct[0]          # den/correct carry no input gradient
    n, cin = x.shape
    vma = getattr(jax.typeof(x), "vma", frozenset())
    in_specs, vspec = _specs(tile, cin, with_ct=True)
    wpad = jnp.pad(w.astype(x.dtype), ((0, 0), (0, LANES - w.shape[1])))
    dx, dwp, dbp, dgl, dbl = pl.pallas_call(
        functools.partial(_bwd_kernel, num_classes=num_classes),
        grid=(pl.cdiv(n, tile),),
        in_specs=in_specs,
        out_specs=[
            vspec((tile, cin), lambda i: (i, 0)),
            vspec((cin, LANES), lambda i: (0, 0)),
            vspec((1, LANES), lambda i: (0, 0)),
            vspec((1, cin), lambda i: (0, 0)),
            vspec((1, cin), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cin), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((cin, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cin), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, cin), jnp.float32, vma=vma),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        x, mu.reshape(1, cin), inv.reshape(1, cin),
        gamma.reshape(1, cin), beta.reshape(1, cin),
        wpad, _pad_lanes(b),
        labels.reshape(n, 1).astype(jnp.int32),
        _pad_lanes(class_weights),
        jnp.reshape(ct_num, (1, 1)).astype(jnp.float32),
    )
    c = w.shape[1]
    dg_like = dgl.reshape(-1)
    dbta_like = dbl.reshape(-1)
    dgamma = dg_like
    dbeta = dbta_like
    # same stats-input cotangent algebra as fused_block._fused_bwd
    dmu = -gamma * inv * dbta_like
    dinv = gamma * dg_like / inv
    # class_weights are treated as data (the reference never optimizes
    # them); labels are integral (symbolic-zero tangent)
    return (dx, dmu, dinv, dgamma, dbeta, dwp[:, :c].astype(jnp.float32),
            dbp[0, :c], None, jnp.zeros_like(class_weights))


fused_seg4_ce.defvjp(_ce_fwd, _ce_bwd)
