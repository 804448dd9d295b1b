"""Per-piece cost of the fused U-Net layer chain at 64^3/w16/B8.

A 'layer' in the fused core = fused_conv3x3 (prev GN+ReLU in prologue)
+ grid_group_stats + fold_gn. Times each piece and a 3-layer chain,
XLA equivalent beside it.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402  (unused, keeps import graph warm)
from pcseg_tpu.ops.conv3d import (  # noqa: E402
    conv3d,
    conv3d_init,
    group_norm,
    group_norm_init,
)
from pcseg_tpu.ops.pallas.conv3d_block import (  # noqa: E402
    fold_gn,
    fused_conv3x3,
    grid_group_stats,
)

B, R, C = 8, 64, 16
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


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, R, R, R, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    gnp = {"scale": jnp.ones((C,), jnp.float32),
           "bias": jnp.zeros((C,), jnp.float32)}

    def dep(y, x):
        return x + jnp.sum(y.astype(jnp.float32)).astype(x.dtype) * 1e-9

    # stats alone
    def stats_only(x):
        m, v = grid_group_stats(x, 8)
        sc, sh = fold_gn(m, v, gnp["scale"], gnp["bias"], 8)
        return dep(sc, x)

    print(f"stats+fold:        {timed(stats_only, x0):8.3f} ms")

    sc0 = jnp.ones((B, 128), jnp.float32)
    sh0 = jnp.zeros((B, 128), jnp.float32)

    def conv_only(x):
        return dep(fused_conv3x3(x, w, bias, sc0, sh0, True, False), x)

    print(f"fused conv:        {timed(conv_only, x0):8.3f} ms")

    def layer(x):
        y = fused_conv3x3(x, w, bias, sc0, sh0, True, False)
        m, v = grid_group_stats(y, 8)
        sc, sh = fold_gn(m, v, gnp["scale"], gnp["bias"], 8)
        return dep(sc, dep(y, x))

    print(f"fused conv+stats:  {timed(layer, x0):8.3f} ms")

    def chain(x):
        sc, sh = sc0, sh0
        y = x
        for _ in range(3):
            y = fused_conv3x3(y, w, bias, sc, sh, True, False)
            m, v = grid_group_stats(y, 8)
            sc, sh = fold_gn(m, v, gnp["scale"], gnp["bias"], 8)
        return dep(y, x)

    print(f"fused 3-chain:     {timed(chain, x0):8.3f} ms")

    cp = {"kernel": w, "bias": bias}

    def xla_layer(x):
        y = conv3d(cp, x, compute_dtype=jnp.bfloat16)
        y = jnp.maximum(group_norm(gnp, y), 0.0).astype(jnp.bfloat16)
        return dep(y, x)

    print(f"xla conv+gn+relu:  {timed(xla_layer, x0):8.3f} ms")

    def xla_chain(x):
        y = x
        for _ in range(3):
            y = conv3d(cp, y, compute_dtype=jnp.bfloat16)
            y = jnp.maximum(group_norm(gnp, y), 0.0).astype(jnp.bfloat16)
        return dep(y, x)

    print(f"xla 3-chain:       {timed(xla_chain, x0):8.3f} ms")

    # fwd+bwd of the 3-chain
    def g_of(chain_fn):
        def loss(ww, x):
            return jnp.sum(chain_fn(x, ww).astype(jnp.float32) ** 2) * 1e-6

        gr = jax.grad(loss)

        def fb(x):
            g = gr(w, x)
            return dep(g, x)

        return fb

    def fused_chain_w(x, ww):
        sc, sh = sc0, sh0
        y = x
        for _ in range(3):
            y = fused_conv3x3(y, ww, bias, sc, sh, True, False)
            m, v = grid_group_stats(y, 8)
            sc, sh = fold_gn(m, v, gnp["scale"], gnp["bias"], 8)
        return y

    def xla_chain_w(x, ww):
        y = x
        for _ in range(3):
            y = conv3d({"kernel": ww, "bias": bias}, y,
                       compute_dtype=jnp.bfloat16)
            y = jnp.maximum(group_norm(gnp, y), 0.0).astype(jnp.bfloat16)
        return y

    print(f"fused 3-chain f+b: {timed(g_of(fused_chain_w), x0):8.3f} ms")
    print(f"xla 3-chain f+b:   {timed(g_of(xla_chain_w), x0):8.3f} ms")


if __name__ == "__main__":
    main()
