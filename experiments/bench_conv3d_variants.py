"""Why is XLA conv3d 19x off roofline at U-Net widths, and what's faster?

Times 3^3 conv formulations at B8 x 64^3 x 16ch bf16 (differential-scan
timing). Roofline: 2*8*64^3*27*16*16 FLOP = 29 GFLOP -> ~0.2 ms at the
measured 148 TFLOP/s bf16 peak; HBM floor ~0.2 ms (2 x 67 MB).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

B, R, C = 8, 64, 16
K = 4
DN = ("NDHWC", "DHWIO", "NDHWC")


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
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.bfloat16)

    def dep(y, x):
        return x + jnp.mean(y).astype(x.dtype) * 1e-6

    def v_xla(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=DN
        )
        return dep(y, x)

    def v_xla_f32(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32),
            (1, 1, 1), "SAME", dimension_numbers=DN,
        )
        return dep(y, x)

    def v_conv2d_sum(x):
        # 3D conv = sum of three 2D convs over D-shifted inputs
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        x2 = xp.reshape(B * (R + 2), R, R, C)
        outs = []
        for dz in range(3):
            y2 = jax.lax.conv_general_dilated(
                xp[:, dz : dz + R].reshape(B * R, R, R, C),
                w[dz], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(y2)
        y = (outs[0] + outs[1] + outs[2]).reshape(B, R, R, R, C)
        return dep(y, x)

    def v_shift_matmul(x):
        # direct conv: 27 shifted (N, C) @ (C, C) matmuls, K=C contraction
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros((B, R, R, R, C), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = xp[:, dz:dz + R, dy:dy + R, dx:dx + R, :]
                    y = y + jax.lax.dot_general(
                        sl.reshape(-1, C), w[dz, dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(B, R, R, R, C)
        return dep(y, x)

    def v_shift_concat_matmul(x):
        # im2col along D only: (N, 3*C) @ (3*C, C) per (dy, dx) -> K=48
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros((B, R, R, R, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = jnp.concatenate(
                    [xp[:, dz:dz + R, dy:dy + R, dx:dx + R, :]
                     for dz in range(3)], axis=-1)
                wk = w[:, dy, dx].reshape(3 * C, C)
                y = y + jax.lax.dot_general(
                    sl.reshape(-1, 3 * C), wk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(B, R, R, R, C)
        return dep(y, x)

    for name, fn in [
        ("xla conv bf16", v_xla),
        ("xla conv f32", v_xla_f32),
        ("3x conv2d sum", v_conv2d_sum),
        ("27 shift-matmul", v_shift_matmul),
        ("9 shiftcat-matmul", v_shift_concat_matmul),
    ]:
        try:
            t = timed(fn, x0)
            print(f"{name:20s} {t:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
