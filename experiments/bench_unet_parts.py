"""Where does the VoxelUNet3d step time go?

Differential-scan timing (K vs 4K iterations in one jit cancels the
relay's fixed per-call latency) of each stage: voxelize, single conv
blocks at each resolution, GroupNorm alone, U-Net core fwd, devoxelize,
and the full train step. The U-Net's conv FLOPs roofline is ~1 ms at
64^3/w16/B8 vs a measured 132.8 ms step (BASELINE.md) — this locates
the pathology.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402
from pcseg_tpu.ops.conv3d import (  # noqa: E402
    conv3d,
    conv3d_init,
    group_norm,
    group_norm_init,
)
from pcseg_tpu.ops.voxel import devoxelize_trilinear, voxelize  # noqa: E402

B, NPTS, R, W = 8, 8192, 64, 16
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


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, NPTS, 4)), jnp.float32)
    mask = jnp.ones((B, NPTS), bool)
    model = VoxelUNet3d(num_classes=4, grid_size=R, width=W,
                        compute_dtype="bfloat16")
    variables = model.init(jax.random.key(0))
    grid = voxelize(pts, mask, R)
    feats = grid.features.astype(jnp.bfloat16)
    cin = feats.shape[-1]
    print("voxel feature channels:", cin, "grid:", feats.shape)

    # voxelize alone (carry pts)
    t = timed(lambda p: p + voxelize(p, mask, R).features.mean() * 1e-6, pts)
    print(f"voxelize:            {t:8.3f} ms")

    # single conv3d w->w at full res
    cp = conv3d_init(jax.random.key(1), 3, W, W)
    x0 = jnp.asarray(rng.normal(size=(B, R, R, R, W)), jnp.bfloat16)
    t = timed(lambda x: conv3d(cp, x, compute_dtype=jnp.bfloat16)
              .astype(jnp.bfloat16), x0)
    print(f"conv3d 16->16 @64^3: {t:8.3f} ms   (roofline ~0.2 ms)")

    gp = group_norm_init(W)
    t = timed(lambda x: group_norm(gp, x).astype(jnp.bfloat16), x0)
    print(f"group_norm @64^3:    {t:8.3f} ms")

    t = timed(
        lambda x: jnp.maximum(
            group_norm(gp, conv3d(cp, x, compute_dtype=jnp.bfloat16)), 0.0
        ).astype(jnp.bfloat16),
        x0,
    )
    print(f"conv+gn+relu @64^3:  {t:8.3f} ms")

    # full U-Net core forward
    def core_fwd(x):
        out = model._unet_core(variables["params"], x)
        return x + jnp.mean(out).astype(x.dtype) * 1e-6

    t = timed(core_fwd, feats)
    print(f"unet core fwd:       {t:8.3f} ms")

    # devoxelize
    vox = jnp.asarray(rng.normal(size=(B, R, R, R, 4)), jnp.float32)
    t = timed(
        lambda v: v + jnp.mean(
            devoxelize_trilinear(v, pts, mask, grid.lo, grid.scale)
        ) * 1e-6,
        vox,
    )
    print(f"devoxelize:          {t:8.3f} ms")

    # full model fwd + bwd
    labels = jnp.asarray(rng.integers(0, 4, size=(B, NPTS)))

    def loss(params, p):
        logits, _ = model.apply(
            {"params": params}, p, train=True, mask=mask
        )
        return jnp.mean(
            (logits - jax.nn.one_hot(labels, 4)) ** 2
        )

    g = jax.grad(loss)

    def fb(p):
        gr = g(variables["params"], p)
        return p + jax.tree.leaves(gr)[0].mean() * 1e-6

    t = timed(fb, pts)
    print(f"full fwd+bwd:        {t:8.3f} ms")


if __name__ == "__main__":
    main()
