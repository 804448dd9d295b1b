"""Decompose the PointNet train step: loss f+b vs optimizer/psum glue.

Times (differential scan, value-synced):
  A. full train step (shard_map, Adam, BN select, metrics)
  B. value_and_grad of the fused loss only (no optimizer, no shard_map)
  C. fused loss forward only
A - B = optimizer + shard_map/psum + running-stat-select glue.
B - C = backward kernels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.pointnet import PointNetSeg  # noqa: E402
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch  # noqa: E402
from pcseg_tpu.train.optim import make_optimizer  # noqa: E402
from pcseg_tpu.train.steps import create_train_state, make_train_step  # noqa: E402

B, M, D, C = 64, 2048, 4, 4
K = 10


def timed(fn, args, sync, reps=4):
    def run(k):
        for _ in range(k):
            out = fn(*args)
            args_new = out  # not used; steps below rebind explicitly
        return out

    # simple repeated-call timing with async dispatch + end sync;
    # per-call dispatch overlaps on this relay when state is donated
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = fn(*args)
        sync(o)
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    rng = np.random.default_rng(0)
    model = PointNetSeg(num_classes=C, bn_stats="fused",
                        compute_dtype="bfloat16")
    tx = make_optimizer()
    mesh = make_mesh(MeshSpec(data=len(jax.devices())))
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh, donate=False)

    pts = jnp.asarray(rng.normal(size=(B, M, D)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, C, size=(B, M)), jnp.int64)
    msk = jnp.ones((B, M), bool)
    batch = shard_batch(mesh, (pts, lbl, msk))
    lr = jnp.float32(1e-3)
    cw = jnp.ones((C,), jnp.float32)
    key = jax.random.key(1)

    t_step = timed(
        lambda: step(state, batch, lr, key, cw),
        (),
        lambda o: float(o[1]["loss"]),
    )
    print(f"A full train step      {t_step:7.3f} ms", flush=True)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (num, den, correct), new_bn = model.fused_train_loss(
            variables, pts, lbl, cw, dropout_key=key,
        )
        return num / den, new_bn

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    t_vg = timed(
        lambda: vg(state.params),
        (),
        lambda o: float(o[0][0]),
    )
    print(f"B loss value_and_grad  {t_vg:7.3f} ms", flush=True)

    fwd = jax.jit(lambda p: loss_fn(p)[0])
    t_f = timed(lambda: fwd(state.params), (), float)
    print(f"C loss forward         {t_f:7.3f} ms", flush=True)

    print(f"A-B glue (opt+psum+bn) {t_step - t_vg:7.3f} ms")
    print(f"B-C backward           {t_vg - t_f:7.3f} ms")


if __name__ == "__main__":
    main()
