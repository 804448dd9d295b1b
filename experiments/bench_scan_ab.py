import time
import numpy as np
import jax, jax.numpy as jnp
from pcseg_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import bench
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from pcseg_tpu.train.optim import make_optimizer
from pcseg_tpu.train.steps import (
    create_train_state, make_train_step, make_scan_train_steps)

K = 20
mesh = make_mesh(MeshSpec(data=len(jax.devices())))
model = PointNetSeg(num_classes=bench.CLASSES, compute_dtype="bfloat16", bn_stats="fused")
tx = make_optimizer()
state = create_train_state(model, jax.random.key(0), tx)
rng = np.random.default_rng(0)
points, labels, masks = bench.make_batch(rng)
batch = shard_batch(mesh, (jnp.asarray(points), jnp.asarray(labels), jnp.asarray(masks)))
lr = jnp.float32(1e-3); cw = jnp.ones((bench.CLASSES,), jnp.float32)

step = make_train_step(model, tx, mesh, donate=True)
keys = [jax.random.key(i) for i in range(3 + K)]
for i in range(3):
    state, m = step(state, batch, lr, keys[i], cw)
float(m["loss"])
t0 = time.perf_counter()
for i in range(K):
    state, m = step(state, batch, lr, keys[3 + i], cw)
float(m["loss"])
loop_dt = (time.perf_counter() - t0) / K
print(f"loop: {loop_dt*1e3:.2f} ms/step -> {bench.BATCH*bench.POINTS/loop_dt/1e6:.2f}M pts/s")

run = make_scan_train_steps(model, tx, mesh)
batches = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), batch)
skeys = jax.random.split(jax.random.key(99), K)
state2 = create_train_state(model, jax.random.key(0), tx)
state2, ms = run(state2, batches, lr, skeys, cw)
float(ms["loss"][-1])
t0 = time.perf_counter()
state2, ms = run(state2, batches, lr, skeys, cw)
float(ms["loss"][-1])
scan_dt = (time.perf_counter() - t0) / K
print(f"scan: {scan_dt*1e3:.2f} ms/step -> {bench.BATCH*bench.POINTS/scan_dt/1e6:.2f}M pts/s")
