"""Isolate the U-Net conv core: XLA vs fused Pallas, fwd and fwd+bwd.

Feeds grid features directly (no voxelize/devoxelize/loss) so the
conv-path delta is visible. Differential-scan timing as elsewhere.
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


def main(b=8, r=64, w=16, levels=3):
    rng = np.random.default_rng(0)
    model = VoxelUNet3d(num_classes=4, grid_size=r, width=w, levels=levels,
                        compute_dtype="bfloat16")
    variables = model.init(jax.random.key(0))
    p = variables["params"]
    cin = model.in_channels
    x0 = jnp.asarray(rng.normal(size=(b, r, r, r, cin)), jnp.bfloat16)

    for name, core in [("xla", model._unet_core),
                       ("fused", model._unet_core_fused)]:
        def fwd(x, core=core):
            out = core(p, x)
            return x + jnp.mean(out).astype(x.dtype) * 1e-6

        t = timed(fwd, x0)
        print(f"core fwd   {name:6s} {t:8.2f} ms")

        def fb(x, core=core):
            def loss(pp, xx):
                return jnp.mean(core(pp, xx).astype(jnp.float32) ** 2)

            gr = jax.grad(loss)(p, x)
            return x + sum(
                jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gr)
            ).astype(x.dtype) * 1e-6

        t = timed(fb, x0)
        print(f"core f+b   {name:6s} {t:8.2f} ms")


if __name__ == "__main__":
    main()
