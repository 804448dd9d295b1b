"""Device-plane kernel profile of the two flagship train steps.

Captures a jax.profiler trace of a few steps (bench.py's exact configs)
and prints per-kernel device totals via experiments/xplane.py — the
ground truth for where step time goes (the relay's host-side timings
can't see inside one dispatch).

Usage: python experiments/profile_steps.py [pointnet|voxel] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from experiments.xplane import latest_trace, print_summary  # noqa: E402
import bench  # noqa: E402  (repo-root bench.py: shared configs)


def profile_pointnet(steps):
    from pcseg_tpu.models.pointnet import PointNetSeg
    from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    mesh = make_mesh(MeshSpec(data=len(jax.devices())))
    model = PointNetSeg(
        num_classes=bench.CLASSES, compute_dtype="bfloat16",
        bn_stats="fused",
    )
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    train_step = make_train_step(model, tx, mesh, donate=True)
    rng = np.random.default_rng(0)
    points, labels, masks = bench.make_batch(rng)
    batch = shard_batch(
        mesh, (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks))
    )
    args = (jnp.float32(1e-3), jax.random.key(7),
            jnp.ones((bench.CLASSES,), jnp.float32))

    def run(state):
        return train_step(state, batch, args[0], args[1], args[2])

    return _trace(run, state, steps)


def profile_voxel(steps, grid128=False):
    from pcseg_tpu.models.voxel_unet import VoxelUNet3d
    from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    mesh = make_mesh(MeshSpec(data=len(jax.devices())))
    if grid128:
        b, m, grid, remat = 1, 16384, 128, True   # bench_128_step config
    else:
        b, m, grid, remat = (bench.VOX_BATCH, bench.VOX_POINTS,
                             bench.VOX_GRID, False)
    model = VoxelUNet3d(
        num_classes=bench.CLASSES, grid_size=grid,
        width=bench.VOX_WIDTH, levels=3, compute_dtype="bfloat16",
        conv_impl="fused", remat=remat,
    )
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    train_step = make_train_step(model, tx, mesh, donate=True)
    rng = np.random.default_rng(0)
    points = rng.normal(size=(b, m, bench.DIM))
    labels = rng.integers(0, bench.CLASSES, size=(b, m))
    masks = np.ones((b, m), bool)
    batch = shard_batch(
        mesh,
        (jnp.asarray(points, jnp.float32), jnp.asarray(labels),
         jnp.asarray(masks)),
    )
    args = (jnp.float32(1e-3), jax.random.key(7),
            jnp.ones((bench.CLASSES,), jnp.float32))

    def run(state):
        return train_step(state, batch, args[0], args[1], args[2])

    return _trace(run, state, steps)


def profile_sparse(steps):
    """bench.bench_sparse_jax's exact program (cache-aligned)."""
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet
    from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state, make_train_step

    mesh = make_mesh(MeshSpec(data=len(jax.devices())))
    model = SparseVoxelNet(
        num_classes=bench.CLASSES, grid_size=bench.VOX_GRID, width=64,
        depth=4, levels=2, impl="block", tile=8, max_tiles=64,
        max_tiles_schedule=(64, 32), compute_dtype="bfloat16",
    )
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    train_step = make_train_step(model, tx, mesh, donate=True)
    rng = np.random.default_rng(0)
    b = bench.VOX_BATCH
    from pcseg_tpu.bench import _track_batch

    points = _track_batch(rng, b, bench.VOX_POINTS)
    labels = rng.integers(0, bench.CLASSES,
                          size=(b, bench.VOX_POINTS)).astype(np.int64)
    masks = np.ones((b, bench.VOX_POINTS), bool)
    batch = shard_batch(
        mesh,
        (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks)),
    )
    args = (jnp.float32(1e-3), jax.random.key(7),
            jnp.ones((bench.CLASSES,), jnp.float32))

    def run(state):
        return train_step(state, batch, args[0], args[1], args[2])

    return _trace(run, state, steps)


def _trace(run, state, steps):
    for _ in range(3):
        state, metrics = run(state)
    float(metrics["loss"])
    logdir = "/tmp/pcseg_profile"
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = run(state)
        float(metrics["loss"])
        wall = (time.perf_counter() - t0) / steps * 1e3
    print(f"wall {wall:.2f} ms/step over {steps} steps "
          f"(includes relay latency)")
    return latest_trace(logdir)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pointnet"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    fns = {
        "pointnet": profile_pointnet,
        "voxel": profile_voxel,
        "voxel128": lambda s: profile_voxel(s, grid128=True),
        "sparse": profile_sparse,
    }
    path = fns[which](steps)
    print_summary(path, top=60)


if __name__ == "__main__":
    main()
