"""What does a plain XLA matmul achieve at the fused-block shapes?

The r3 anatomy bench showed the Pallas fwd kernels at ~2x their computed
matmul+HBM roofline even with the prologue/stats stripped to a bare
matmul+write. This times jnp.dot at the same shapes/dtypes to separate
"Pallas overhead" from "the roofline number is not achievable".
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

N = 64 * 2048
K = 20

SHAPES = [
    ("conv5", 128, 1024),
    ("global", 1024, 1024),
    ("seg1", 64, 512),
    ("seg2", 512, 256),
]


def timed_scan(step, x0, reps=4):
    def make(k):
        @jax.jit
        def run(x):
            def body(x, _):
                return step(x), None

            out, _ = jax.lax.scan(body, x, None, length=k)
            return out

        return run

    short, long = make(K), make(6 * K)

    def once(run):
        out = run(x0)
        float(out.reshape(-1)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(x0)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (once(long) - once(short)) / (5 * K) * 1e3


def main():
    rng = np.random.default_rng(0)
    for name, cin, cout in SHAPES:
        x0 = jnp.asarray(rng.normal(size=(N, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.bfloat16)

        def step(x):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            # cheap dependency back to x's shape
            return x + y[:, : x.shape[1]] * jnp.bfloat16(1e-6)

        t = timed_scan(step, x0)
        roof = 2.0 * N * cin * cout / 148e12 * 1e3
        hbm = (N * (cin + cout) * 2) / 819e9 * 1e3
        print(f"{name:8s} xla {t:6.3f} ms   mxu-roof {roof:5.3f} "
              f"hbm-roof {hbm:5.3f}", flush=True)


if __name__ == "__main__":
    main()
