"""A/B: epoch wall time with lagged step logging on vs off.

VERDICT r3 item 8 — the on-by-default progress lines must cost nothing:
they read metrics LAGGED by one log window (train/loop.py), so by the
time the host fetches them the device has long since materialized the
values and the read is a pure transfer, not a pipeline stall.
"""

from __future__ import annotations

import time

import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache
from pcseg_tpu.core import prng
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh
from pcseg_tpu.train.loop import _run_epoch_train
from pcseg_tpu.train.optim import make_optimizer
from pcseg_tpu.train.steps import create_train_state, make_train_step

BATCH, POINTS, CLASSES, STEPS = 64, 2048, 4, 120


def make_batches(rng, n):
    out = []
    for _ in range(n):
        pts = rng.normal(size=(BATCH, POINTS, 4)).astype(np.float32)
        lbl = rng.integers(0, CLASSES, size=(BATCH, POINTS)).astype(np.int64)
        msk = np.ones((BATCH, POINTS), bool)
        msk[:, int(POINTS * 0.75):] = False
        lbl[~msk] = -1
        pts[~msk] = 0.0
        out.append((pts, lbl, msk))
    return out


def main():
    import jax.numpy as jnp

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    batches = make_batches(rng, STEPS)
    mesh = make_mesh(MeshSpec(data=1))
    model = PointNetSeg(
        num_classes=CLASSES, compute_dtype="bfloat16", bn_stats="fused"
    )
    opt = make_optimizer()
    root = prng.root_key(0)
    step = make_train_step(model, opt, mesh)
    cw = jnp.ones((CLASSES,), jnp.float32)

    sink_lines = []
    for label, log_every, log in (
        ("warmup", 0, print),
        ("log_off", 0, print),
        ("log_on_20", 20, sink_lines.append),
        ("log_off2", 0, print),
        ("log_on_20b", 20, sink_lines.append),
    ):
        # fresh state per run: the step donates its state buffers
        state0 = create_train_state(
            model, prng.purpose_key(root, "params"), opt
        )
        t0 = time.perf_counter()
        state, loss, acc, _ = _run_epoch_train(
            step, batches, state0, 1e-3, cw, root, 0, log, log_every
        )
        dt = time.perf_counter() - t0
        if label != "warmup":
            print(f"{label}: {dt * 1000 / STEPS:.3f} ms/step "
                  f"(epoch {dt:.3f}s, loss {loss:.4f})")
    print(f"log lines emitted: {len(sink_lines)}; first: {sink_lines[:1]}")


if __name__ == "__main__":
    main()
