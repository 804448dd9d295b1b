"""Prototype: conv3d as lane-packed block matmuls (XLA), vs conv_general.

The measured pathology (bench_conv3d_variants / BASELINE.md): XLA's 3^3
conv at U-Net widths (C=16, 64^3) runs at ~4 ms — 20x off roofline —
because channels-last C=16 arrays tile the TPU's 128-lane registers at
12.5% and the implicit GEMM has N=16.

Fix: view the NDHWC grid as (B, D, H, U=W/8, 8*C=128) — a contiguous
reinterpretation, no data movement — so the lane dim is exactly 128.
The conv becomes:
  main: for the 9 (dz, dy) taps, a row-shifted slab contributes via a
        (128, 128) block-banded weight covering dx in {-1,0,1} WITHIN
        the 8-position lane block -> one (M, 9*128) @ (9*128, 128) GEMM.
  edge: w-positions 0 and 7 of each block need one 16-lane column from
        the neighboring block -> a (M, 9*32) @ (9*32, 128) GEMM.
FLOP inflation vs the dense conv: (1152+288)*128 / (27*16*16) = 2.7x,
but the MXU runs at full K/N utilization instead of ~1.5%.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

B, R, C = 8, 64, 16
P = 128 // C          # positions packed per lane block
U = R // P
K = 4
DN = ("NDHWC", "DHWIO", "NDHWC")


def pack_weights(w):
    """w: (3,3,3,C,C) -> W_main (9*128, 128), W_edge (9*2*C, 128)."""
    wm = np.zeros((9, P, C, P, C), np.float32)   # (tap, i, ci, j, co)
    we = np.zeros((9, 2, C, P, C), np.float32)   # (tap, side, ci, j, co)
    w = np.asarray(w, np.float32)
    t = 0
    for dz in range(3):
        for dy in range(3):
            for i in range(P):
                for dx in (-1, 0, 1):
                    j = i - dx           # input at o+dx -> o = i - dx
                    if 0 <= j < P:
                        # within-block: input pos i feeds output pos j
                        wm[t, i, :, j, :] = w[dz, dy, dx + 1]
            # side 0: input i=P-1 of block u-1 feeds output j=0 (dx=-1)
            we[t, 0, :, 0, :] = w[dz, dy, 0]
            # side 1: input i=0 of block u+1 feeds output j=P-1 (dx=+1)
            we[t, 1, :, P - 1, :] = w[dz, dy, 2]
            t += 1
    return (
        jnp.asarray(wm.reshape(9 * 128, 128)),
        jnp.asarray(we.reshape(9 * 2 * C, 128)),
    )


def conv3d_bm(x, wm, we, dtype=jnp.bfloat16):
    """x: (B, D, H, W, C) -> same. SAME padding, stride 1."""
    b, d, h, wdim, c = x.shape
    u = wdim // P
    xv = x.reshape(b, d, h, u, 128).astype(dtype)
    xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    slabs = [
        xp[:, dz : dz + d, dy : dy + h]
        for dz in range(3)
        for dy in range(3)
    ]
    pm = jnp.concatenate(slabs, axis=-1)               # (..., 9*128)
    # neighbors along U for the edge GEMM
    zrow = jnp.zeros_like(xv[:, :, :, :1, -C:])
    left = jnp.concatenate([zrow, xv[:, :, :, :-1, -C:]], axis=3)
    right = jnp.concatenate([xv[:, :, :, 1:, :C], zrow], axis=3)
    lp = jnp.pad(left, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    rp = jnp.pad(right, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    pe = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    lp[:, dz : dz + d, dy : dy + h],
                    rp[:, dz : dz + d, dy : dy + h],
                ],
                axis=-1,
            )
            for dz in range(3)
            for dy in range(3)
        ],
        axis=-1,
    )                                                   # (..., 9*2*C)
    y = jax.lax.dot_general(
        pm.reshape(-1, 9 * 128), wm.astype(dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        pe.reshape(-1, 9 * 2 * C), we.astype(dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return y.reshape(b, d, h, wdim, c)


def timed(step, x0, reps=3):
    def make(k):
        @jax.jit
        def run(x):
            def body(x, _):
                return step(x), None

            out, _ = jax.lax.scan(body, x, None, length=k)
            return out

        return run

    short, long = make(K), make(4 * K)

    def once(run):
        out = run(x0)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(x0)
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (once(long) - once(short)) / (3 * K) * 1e3


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, R, R, R, C)), jnp.bfloat16)
    w = rng.normal(size=(3, 3, 3, C, C)).astype(np.float32) * 0.05
    wj = jnp.asarray(w, jnp.bfloat16)
    wm, we = pack_weights(w)

    # numerics check (f32)
    xs = jnp.asarray(rng.normal(size=(2, 16, 16, 16, C)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        xs, jnp.asarray(w), (1, 1, 1), "SAME", dimension_numbers=DN
    )
    got = conv3d_bm(xs, wm, we, dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)))
    print("max |ref - bm| =", err)
    assert err < 1e-4, err

    def dep(y, x):
        return x + jnp.mean(y).astype(x.dtype) * 1e-6

    def v_xla(x):
        y = jax.lax.conv_general_dilated(
            x, wj, (1, 1, 1), "SAME", dimension_numbers=DN
        )
        return dep(y, x)

    def v_bm(x):
        return dep(conv3d_bm(x, wm, we), x)

    for name, fn in [("xla conv bf16", v_xla), ("block-matmul", v_bm)]:
        t = timed(fn, x0)
        print(f"{name:20s} {t:8.3f} ms")


def bench_pallas():
    from pcseg_tpu.ops.pallas.conv3d_block import fused_conv3x3

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, R, R, R, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    scale = jnp.ones((B, 128), jnp.float32)
    shift = jnp.zeros((B, 128), jnp.float32)

    def dep(y, x):
        return x + jnp.mean(y.astype(jnp.float32)).astype(x.dtype) * 1e-6

    def v_pallas(x):
        return dep(fused_conv3x3(x, w, bias, scale, shift, True, False), x)

    def v_pallas_noact(x):
        return dep(fused_conv3x3(x, w, bias, scale, shift, False, False), x)

    for name, fn in [
        ("pallas fused+act", v_pallas),
        ("pallas conv only", v_pallas_noact),
    ]:
        t = timed(fn, x0)
        print(f"{name:20s} {t:8.3f} ms")




def bench_bwd():
    from pcseg_tpu.ops.pallas.conv3d_block import _conv_ref, fused_conv3x3

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, R, R, R, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    scale = jnp.ones((B, 128), jnp.float32)
    shift = jnp.zeros((B, 128), jnp.float32)

    def dep(grads, x):
        return x + sum(
            jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(grads)
        ).astype(x.dtype) * 1e-6

    def loss_fused(x):
        y = fused_conv3x3(x, w, bias, scale, shift, True, False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x):
        y = _conv_ref(x, w, bias, scale, shift, activate=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_fused_w(x):
        y = fused_conv3x3(x, w, bias, scale, shift, True, False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def grad_all(loss):
        def f(x):
            l2 = lambda xx: loss(xx)
            gx = jax.grad(lambda xx, ww, bb, sc, sh: jnp.sum(
                (fused_conv3x3(xx, ww, bb, sc, sh, True, False)
                 if loss is loss_fused else
                 _conv_ref(xx, ww, bb, sc, sh, activate=True)
                 ).astype(jnp.float32) ** 2
            ), argnums=(0, 1, 2, 3, 4))(x, w, bias, scale, shift)
            return gx
        return f

    for name, fn in [
        ("pallas fwd+bwd(x)", jax.grad(loss_fused)),
        ("xla ref fwd+bwd(x)", jax.grad(loss_ref)),
        ("pallas fwd+bwd all", grad_all(loss_fused)),
        ("xla ref fwd+bwd all", grad_all(loss_ref)),
    ]:
        t = timed(lambda x, fn=fn: dep(fn(x), x), x0)
        print(f"{name:20s} {t:8.3f} ms")


if __name__ == "__main__":
    main()
    bench_pallas()
    bench_bwd()
