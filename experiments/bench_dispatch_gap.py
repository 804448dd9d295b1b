"""How much of the train-step wall time is host dispatch vs device?

Times (a) the enqueue-only loop (no final sync), (b) the synced loop,
at K=40 steps. If (a) is ~the same as (b), the HOST is the bottleneck:
the relay's per-dispatch cost exceeds the device step time and the
device starves. Run: python -m experiments.bench_dispatch_gap
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from pcseg_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import bench
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from pcseg_tpu.train.optim import make_optimizer
from pcseg_tpu.train.steps import create_train_state, make_train_step

K = 40
mesh = make_mesh(MeshSpec(data=len(jax.devices())))
model = PointNetSeg(num_classes=bench.CLASSES, compute_dtype="bfloat16",
                    bn_stats="fused")
tx = make_optimizer()
state = create_train_state(model, jax.random.key(0), tx)
rng = np.random.default_rng(0)
pts, lbl, msk = bench.make_batch(rng)
batch = shard_batch(mesh, (jnp.asarray(pts), jnp.asarray(lbl), jnp.asarray(msk)))
lr = jnp.float32(1e-3); cw = jnp.ones((bench.CLASSES,), jnp.float32)
step = make_train_step(model, tx, mesh, donate=True)
keys = [jax.random.key(i) for i in range(3 + 2 * K)]
for i in range(3):
    state, m = step(state, batch, lr, keys[i], cw)
float(m["loss"])

t0 = time.perf_counter()
for i in range(K):
    state, m = step(state, batch, lr, keys[3 + i], cw)
t_enq = (time.perf_counter() - t0) / K
float(m["loss"])
t_all = (time.perf_counter() - t0) / K
print(f"enqueue-only {t_enq*1e3:.2f} ms/step; synced {t_all*1e3:.2f} ms/step")
