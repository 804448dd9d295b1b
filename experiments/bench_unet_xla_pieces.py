"""Time the U-Net pieces the fused core leaves on XLA.

stem (2->16), down stride-2, up transpose, 1x1 head, at their in-core
resolutions (B8, base 64^3, w16 L3)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.conv3d import (  # noqa: E402
    conv3d,
    conv3d_init,
    conv3d_transpose,
)

B = 8
K = 2


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


def dep(y, x):
    return x + jnp.sum(y.astype(jnp.float32)).astype(x.dtype) * 1e-9


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    cases = [
        ("stem 2->16 @64^3 k3", 64, 2, conv3d_init(jax.random.key(0), 3, 2, 16),
         lambda p, x: conv3d(p, x, compute_dtype=dt)),
        ("down0 16->32 @64 s2", 64, 16, conv3d_init(jax.random.key(1), 2, 16, 32),
         lambda p, x: conv3d(p, x, stride=2, compute_dtype=dt)),
        ("down1 32->64 @32 s2", 32, 32, conv3d_init(jax.random.key(2), 2, 32, 64),
         lambda p, x: conv3d(p, x, stride=2, compute_dtype=dt)),
        ("up1 64->32 @16 s2", 16, 64, conv3d_init(jax.random.key(3), 2, 64, 32),
         lambda p, x: conv3d_transpose(p, x, stride=2, compute_dtype=dt)),
        ("up0 32->16 @32 s2", 32, 32, conv3d_init(jax.random.key(4), 2, 32, 16),
         lambda p, x: conv3d_transpose(p, x, stride=2, compute_dtype=dt)),
        ("head 16->4 @64 k1", 64, 16, conv3d_init(jax.random.key(5), 1, 16, 4),
         lambda p, x: conv3d(p, x, compute_dtype=dt)),
    ]
    for name, r, cin, p, fn in cases:
        x0 = jnp.asarray(rng.normal(size=(B, r, r, r, cin)), dt)
        t_f = timed(lambda x, p=p, fn=fn: dep(fn(p, x), x), x0)

        def fb(x, p=p, fn=fn):
            g = jax.grad(
                lambda xx: jnp.sum(fn(p, xx).astype(jnp.float32) ** 2) * 1e-6
            )(x)
            return dep(g, x)

        t_b = timed(fb, x0)
        print(f"{name:22s} fwd {t_f:7.3f} ms   f+b {t_b:7.3f} ms")


if __name__ == "__main__":
    main()
