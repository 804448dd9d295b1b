"""VoxelUNet3d train-step: XLA conv core vs fused Pallas core.

North-star configs 2/3 (BASELINE.json): 64^3/w16/B8 and 128^3/w16/B1.
Differential-scan timing (cancels fixed dispatch latency).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402

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


def bench(b, npts, r, w, levels, remat, impl):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(b, npts, 4)), jnp.float32)
    mask = jnp.ones((b, npts), bool)
    labels = jnp.asarray(rng.integers(0, 4, size=(b, npts)))
    model = VoxelUNet3d(
        num_classes=4, grid_size=r, width=w, levels=levels,
        compute_dtype="bfloat16", conv_impl=impl, remat=remat,
    )
    variables = model.init(jax.random.key(0))

    def loss(params, p):
        logits, _ = model.apply({"params": params}, p, train=True, mask=mask)
        oh = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    g = jax.grad(loss)

    def fb(p):
        gr = g(variables["params"], p)
        # depend on EVERY gradient leaf — using only one lets XLA
        # dead-code-eliminate the rest of the backward
        tot = sum(jnp.sum(x).astype(jnp.float32)
                  for x in jax.tree.leaves(gr))
        return p + tot.astype(p.dtype) * 1e-9

    t = timed(fb, pts)
    tag = f"B{b} R{r} w{w} L{levels}{' remat' if remat else ''} {impl}"
    print(f"{tag:36s} {t:8.1f} ms/step")
    return t


def main():
    for impl in ("xla", "fused"):
        bench(8, 8192, 64, 16, 3, False, impl)
    for impl in ("xla", "fused"):
        bench(1, 16384, 128, 16, 3, True, impl)


if __name__ == "__main__":
    main()
