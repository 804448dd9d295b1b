"""Device-plane kernel profile of the block-sparse U-Net train f+b.

VERDICT r4 item 5: the tile-hierarchy sparse U-Net runs 101 ms f+b at
levels=2/d4/w64 vs 225 masked-dense — only 2.2x at ~6% tile occupancy.
This captures where the 101 ms actually goes (halo slice gathers?
capacity padding? hierarchy glue?) via the xplane per-kernel totals.

Usage: PYTHONPATH=/root/repo python experiments/profile_block_sparse.py
       [steps] [cap]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from experiments.xplane import device_summary, latest_trace  # noqa: E402
from experiments.bench_block_sparse import (  # noqa: E402
    B, M, R, C, track_events,
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cap1 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    from pcseg_tpu.models.sparse_unet import SparseVoxelNet

    rng = np.random.default_rng(0)
    pts, mask = track_events(rng, B, M)
    labels = jnp.asarray(rng.integers(0, 4, size=(B, M)))

    m = SparseVoxelNet(num_classes=4, grid_size=R, width=C, depth=4,
                       levels=2, impl="block", tile=8, max_tiles=cap,
                       max_tiles_schedule=(cap, cap1) if cap1 else (),
                       compute_dtype="bfloat16")
    v = m.init(jax.random.key(0))

    def loss(params, p):
        logits, _ = m.apply({"params": params, "batch_stats": {}},
                            p, train=True, mask=mask)
        oh = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    @jax.jit
    def fb(params, p):
        return jax.grad(loss)(params, p)

    g = fb(v["params"], pts)
    float(jax.tree.leaves(g)[0].reshape(-1)[0])

    logdir = "/tmp/pcseg_profile_bs"
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            g = fb(v["params"], pts)
        float(jax.tree.leaves(g)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        g = fb(v["params"], pts)
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    print(f"wall: {(time.perf_counter() - t0) / steps * 1e3:.2f} ms/step")

    rows = device_summary(latest_trace(logdir))
    total = sum(ms for _, ms, _ in rows)
    print(f"device total {total / steps:.3f} ms/step ({len(rows)} ops)")
    groups = {}
    for name, ms, n in rows:
        key = name.split(" = ")[0].lstrip("%").rstrip("0123456789.")
        groups.setdefault(key, [0.0, 0])
        groups[key][0] += ms
        groups[key][1] += n
    for key, (ms, n) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:28]:
        print(f"{ms / steps:8.3f} ms/step {n:5d}x  {key}")
    print("--- top single ops:")
    for name, ms, n in rows[:20]:
        print(f"{ms / steps:8.3f} ms/step {n:4d}x  {name[:110]}")


if __name__ == "__main__":
    main()
