"""One-process comparison: core f+b and full train step, XLA vs fused.

Interleaves measurements (A,B,A,B) to decorrelate relay drift.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402

K = 2


def make_runs(step, k):
    @jax.jit
    def run(x):
        def body(x, _):
            return step(x), None

        out, _ = jax.lax.scan(body, x, None, length=k)
        return out

    return run


def measure(runs, x0, reps=4):
    # runs: dict name -> (short, long). Warm up all, then interleave.
    for s, l in runs.values():
        for r in (s, l):
            out = r(x0)
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = {n: [float("inf"), float("inf")] for n in runs}
    for _ in range(reps):
        for n, (s, l) in runs.items():
            for i, r in enumerate((s, l)):
                t0 = time.perf_counter()
                out = r(x0)
                float(jax.tree.leaves(out)[0].reshape(-1)[0])
                best[n][i] = min(best[n][i], time.perf_counter() - t0)
    return {n: (b[1] - b[0]) / (3 * K) * 1e3 for n, b in best.items()}


def main(b=8, npts=8192, r=64, w=16, levels=3):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(b, npts, 4)), jnp.float32)
    mask = jnp.ones((b, npts), bool)
    labels = jnp.asarray(rng.integers(0, 4, size=(b, npts)))

    models = {
        impl: VoxelUNet3d(num_classes=4, grid_size=r, width=w, levels=levels,
                          compute_dtype="bfloat16", conv_impl=impl)
        for impl in ("xla", "fused")
    }
    variables = models["xla"].init(jax.random.key(0))
    p = variables["params"]
    cin = models["xla"].in_channels
    x0 = jnp.asarray(rng.normal(size=(b, r, r, r, cin)), jnp.bfloat16)

    runs = {}
    for impl, m in models.items():
        core = m._unet_core if impl == "xla" else m._unet_core_fused

        def fb_core(x, core=core):
            def loss(pp, xx):
                return jnp.mean(core(pp, xx).astype(jnp.float32) ** 2)

            gr = jax.grad(loss)(p, x)
            return x + sum(
                jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gr)
            ).astype(x.dtype) * 1e-6

        runs[f"core f+b {impl}"] = (
            make_runs(fb_core, K), make_runs(fb_core, 4 * K)
        )

    core_res = measure(runs, x0)
    for n, t in core_res.items():
        print(f"{n:22s} {t:8.2f} ms")

    runs2 = {}
    for impl, m in models.items():
        def loss(params, pp, m=m):
            logits, _ = m.apply({"params": params}, pp, train=True, mask=mask)
            oh = jax.nn.one_hot(labels, 4)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

        g = jax.grad(loss)

        def fb(pp, g=g):
            gr = g(p, pp)
            # depend on EVERY grad leaf or XLA DCEs most of the backward
            tot = sum(jnp.sum(x).astype(jnp.float32)
                      for x in jax.tree.leaves(gr))
            return pp + tot.astype(pp.dtype) * 1e-9

        runs2[f"full step {impl}"] = (make_runs(fb, K), make_runs(fb, 4 * K))

    step_res = measure(runs2, pts)
    for n, t in step_res.items():
        print(f"{n:22s} {t:8.2f} ms")


if __name__ == "__main__":
    main()
