"""Submanifold conv impls at LArTPC-like occupancy: block vs dense vs gather.

R=64, C=64, B=8, track-like events (~2-4% voxel occupancy, ~10-25% tile
occupancy at t=8). Round-1 numbers to beat: masked dense 14.3 ms,
gather rulebook 31.6 ms (BASELINE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.block_sparse import (  # noqa: E402
    block_sparse_from_grid,
    block_subm_conv,
)
from pcseg_tpu.ops.sparse import (  # noqa: E402
    sparse_from_grid,
    subm_conv,
    subm_conv_dense,
    subm_conv_init,
)
from pcseg_tpu.ops.voxel import voxelize  # noqa: E402

B, M, R, C = 8, 8192, 64, 64
import os
TILE = 8
MAX_TILES = int(os.environ.get("BS_CAP", "128"))
MAX_ACTIVE = 8192
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


def track_events(rng, b, m):
    pts = []
    for _ in range(b):
        k = 4
        seg = []
        for _ in range(k):
            a, d = rng.random(3), rng.normal(size=3)
            d /= np.linalg.norm(d)
            s = np.linspace(0, 1, m // k + 1)[:, None]
            seg.append(a + s * d * 0.8)
        p = np.concatenate(seg)[:m]
        e = rng.random((m, 1))
        pts.append(np.concatenate([np.clip(p, 0, 1), e], axis=1))
    return jnp.asarray(np.stack(pts), jnp.float32), jnp.ones((b, m), bool)


def main():
    rng = np.random.default_rng(0)
    pts, mask = track_events(rng, B, M)
    grid = voxelize(pts, mask, R)
    occ = float(jnp.mean((grid.counts > 0).astype(jnp.float32)))
    bs = block_sparse_from_grid(grid, MAX_TILES, TILE)
    tocc = np.asarray(jnp.sum(bs.tile_mask, axis=1))
    print(f"voxel occupancy {occ*100:.2f}%  tiles/event {tocc}")
    if (tocc >= MAX_TILES).any():
        print("WARNING: tile capacity saturated")
    sp = sparse_from_grid(grid, MAX_ACTIVE)

    p = subm_conv_init(jax.random.key(0), C, C)
    dt = jnp.bfloat16

    feats_b = jnp.asarray(
        rng.normal(size=(B, MAX_TILES, TILE, TILE, TILE, C)), dt
    )
    feats_b = feats_b * bs.active[..., None].astype(dt)
    feats_d = jnp.zeros((B, R, R, R, C), dt)
    active = grid.counts > 0
    feats_d = jnp.asarray(
        rng.normal(size=(B, R, R, R, C)), dt
    ) * active[..., None].astype(dt)
    feats_g = jnp.asarray(rng.normal(size=(B, MAX_ACTIVE, C)), dt)

    def dep(y, x):
        return x + jnp.sum(y.astype(jnp.float32)).astype(x.dtype) * 1e-9

    t = timed(lambda f: dep(block_subm_conv(p, bs, feats=f, compute_dtype=dt),
                            f), feats_b)
    print(f"block-sparse (t={TILE}, cap {MAX_TILES}):  {t:8.3f} ms")

    t = timed(lambda f: dep(subm_conv_dense(p, f, active, compute_dtype=dt),
                            f), feats_d)
    print(f"masked dense conv3d:                       {t:8.3f} ms")

    t = timed(
        lambda f: dep(
            subm_conv(p, sp._replace(feats=f), compute_dtype=dt), f
        ),
        feats_g,
    )
    print(f"gather rulebook (A={MAX_ACTIVE}):          {t:8.3f} ms")

    # fwd+bwd too
    def fb(loss_fn, x0):
        g = jax.grad(lambda f: jnp.sum(loss_fn(f).astype(jnp.float32) ** 2)
                     * 1e-6)
        return timed(lambda f: dep(g(f), f), x0)

    t = fb(lambda f: block_subm_conv(p, bs, feats=f, compute_dtype=dt),
           feats_b)
    print(f"block-sparse f+b:                          {t:8.3f} ms")
    t = fb(lambda f: subm_conv_dense(p, f, active, compute_dtype=dt), feats_d)
    print(f"masked dense f+b:                          {t:8.3f} ms")


if __name__ == "__main__":
    main()


def bench_model():
    """Model-level: SparseVoxelNet levels=2 fwd+bwd, block vs dense."""
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(0)
    pts, mask = track_events(rng, B, M)
    labels = jnp.asarray(rng.integers(0, 4, size=(B, M)))

    for label, impl, kw in [
        ("dense", "dense", {}),
        ("block", "block", dict(tile=8, max_tiles=64)),
        ("block+sched", "block", dict(tile=8, max_tiles=64,
                                      max_tiles_schedule=(64, 32))),
    ]:
        m = SparseVoxelNet(num_classes=4, grid_size=R, width=C, depth=4,
                           levels=2, impl=impl,
                           compute_dtype="bfloat16", **kw)
        v = m.init(jax.random.key(0))

        def loss(params, p):
            logits, _ = m.apply({"params": params, "batch_stats": {}},
                                p, train=True, mask=mask)
            oh = jax.nn.one_hot(labels, 4)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

        g = jax.grad(loss)

        def fb(p):
            gr = g(v["params"], p)
            tot = sum(jnp.sum(x).astype(jnp.float32)
                      for x in jax.tree.leaves(gr))
            return p + tot.astype(p.dtype) * 1e-9

        t = timed(fb, pts)
        print(f"SparseVoxelNet L2 d4 w{C} {label:12s} train f+b "
              f"{t:8.2f} ms")


if __name__ == "__main__":
    bench_model()
