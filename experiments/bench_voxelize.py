"""Voxelize: scatter-add vs factorized one-hot MXU contraction.

North-star config shapes (BASELINE.json config 2/3). Differential scan
timing (cancels the relay's fixed per-call latency). The op is
forward-only in every training path (points are data), so fwd is what
matters.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.voxel import voxelize  # noqa: E402

K = 10


def timed_scan(step, x0, reps=4):
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


def bench(b, m, r, impl, dtype_name="bfloat16"):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(b, m, 4)), jnp.float32)
    mask = jnp.ones((b, m), bool)

    def step(p):
        g = voxelize(
            p, mask, r, impl=impl,
            matmul_dtype=jnp.dtype(dtype_name),
        )
        # data-dependent feedback so scan iterations serialize
        bump = (g.features[:, 0, 0, 0, :1] * 1e-6).astype(p.dtype)
        return p + bump[:, None, :] * jnp.ones_like(p[..., :1])

    t = timed_scan(step, pts)
    tag = f"B{b} M{m} R{r} {impl}{'' if impl == 'scatter' else ' ' + dtype_name}"
    print(f"{tag:44s} {t:8.2f} ms")
    return t


def main():
    for impl in ("scatter", "matmul"):
        bench(8, 8192, 64, impl)
    bench(8, 8192, 64, "matmul", "float32")
    for impl in ("scatter", "matmul"):
        bench(1, 16384, 128, impl)


if __name__ == "__main__":
    main()
