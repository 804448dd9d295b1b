"""Where do the non-core ~30 ms of the fused U-Net train step go?

Pieces at B8 x 8192 pts, R=64: voxelize f+b, devoxelize f+b, CE loss
f+b, and the full train step for reference.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402
from pcseg_tpu.ops.voxel import devoxelize_trilinear, voxelize  # noqa: E402

B, NPTS, R = 8, 8192, 64
K = 4


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
    return x + jnp.sum(
        jnp.stack([jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(y)])
    ).astype(x.dtype) * 1e-9


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, NPTS, 4)), jnp.float32)
    mask = jnp.ones((B, NPTS), bool)
    labels = jnp.asarray(rng.integers(0, 4, size=(B, NPTS)))
    grid = voxelize(pts, mask, R)

    # voxelize fwd (no grads flow into it in training: points are data)
    t = timed(lambda p: dep(voxelize(p, mask, R).features, p), pts)
    print(f"voxelize fwd:          {t:8.3f} ms")

    # devoxelize f+b (grads flow back to voxel logits)
    vox = jnp.asarray(rng.normal(size=(B, R, R, R, 4)), jnp.float32)

    def devox_loss(v):
        lg = devoxelize_trilinear(v, pts, mask, grid.lo, grid.scale)
        oh = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(lg) * oh, -1))

    t = timed(lambda v: dep(devox_loss(v), v), vox)
    print(f"devox+CE fwd:          {t:8.3f} ms")
    g = jax.grad(devox_loss)
    t = timed(lambda v: dep(g(v), v), vox)
    print(f"devox+CE f+b:          {t:8.3f} ms")

    # full train step (fused core)
    model = VoxelUNet3d(num_classes=4, grid_size=R, width=16, levels=3,
                        compute_dtype="bfloat16", conv_impl="fused")
    variables = model.init(jax.random.key(0))

    def loss(params, p):
        logits, _ = model.apply({"params": params}, p, train=True, mask=mask)
        oh = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    gf = jax.grad(loss)
    t = timed(lambda p: dep(gf(variables["params"], p), p), pts)
    print(f"full step (fused):     {t:8.3f} ms")


if __name__ == "__main__":
    main()
